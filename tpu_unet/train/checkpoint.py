"""Checkpoint save/restore (SURVEY.md §5.4).

Improves on the reference's weights-only .pth saves
(utils/utils_fit.py:164-172, resume via train.py:288-302):
- full-state checkpoints (params + batch_stats + opt_state + epoch) for
  true resume, via flax msgpack serialization (and orbax when available)
- weights-only loads remain supported with the reference's shape-filtered
  partial merge, so architecture-drifted checkpoints load best-effort
- reference .pth files load through tpu_unet.infer.convert
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_variables(path: str, variables: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host))


def save_full_state(path: str, state, epoch: int, best_val: float):
    """Full-state checkpoint for true resume: params + batch_stats +
    opt_state + step + epoch + best_val in one msgpack file.

    The reference resumes weights-only, with Init_Epoch set by hand
    (train.py:96-97); this loses the adam moments across a restart.  The
    "params"/"batch_stats" keys keep the weights-only layout, so serving
    and partial-merge loaders read these files unchanged.  ``epoch`` is
    the number of COMPLETED epochs (i.e. the epoch index to resume at);
    the LR phase needs no extra state — schedules are pure functions of
    the epoch index (train/schedules.py).
    """
    host = jax.tree_util.tree_map(np.asarray, {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
    })
    host["epoch"] = int(epoch)
    host["step"] = int(state.step)
    host["best_val"] = float(best_val)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host))


def restore_opt_state(template_opt_state, saved_state_dict):
    """Rebuild an optax opt_state from its msgpack state-dict, given a
    freshly-initialized template of the same transformation.  Raises on
    structure mismatch (e.g. resuming across a freeze-phase boundary,
    where the trainable mask — and hence the state tree — changed)."""
    return serialization.from_state_dict(template_opt_state, saved_state_dict)


def load_variables(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def partial_load(template: dict, loaded: dict, verbose: bool = True) -> dict:
    """Shape-matched key-by-key merge (reference: train.py:292-302):
    keys present in both with identical shapes are taken from ``loaded``;
    everything else keeps the template value."""
    tpl = dict(_flatten(template))
    src = dict(_flatten(loaded))
    ok, skipped = [], []
    out = jax.tree_util.tree_map(lambda x: x, template)  # copy structure

    def set_path(tree, path, value):
        for p in path[:-1]:
            tree = tree[p]
        tree[path[-1]] = value

    for path, val in src.items():
        if path in tpl and tuple(np.shape(val)) == tuple(np.shape(tpl[path])):
            set_path(out, path, np.asarray(val))
            ok.append(path)
        else:
            skipped.append(path)
    if verbose:
        print(f"checkpoint: loaded {len(ok)} tensors, "
              f"skipped {len(skipped)} (missing/shape-mismatched)")
    return out


def save_orbax(path: str, variables: dict):
    """Orbax-backed checkpoint — the multi-host/sharded-array option
    (each host writes its own shards; msgpack saves require host-gathered
    arrays).  Path must be a directory."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path),
                   jax.tree_util.tree_map(np.asarray, variables), force=True)


def load_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def load_any(path: str, model_name: Optional[str] = None) -> dict:
    """Load a checkpoint: .pth via the torch converter, orbax directories,
    else msgpack."""
    if path.endswith(".pth"):
        from tpu_unet.infer.convert import convert_pth

        if model_name is None:
            raise ValueError("model_name required to convert a .pth checkpoint")
        return convert_pth(path, model_name)
    if os.path.isdir(path):
        return load_orbax(path)
    return load_variables(path)
