"""Spatial-partitioning characterization: memory scaling + halo cost model.

Turns the H-axis sharding stretch feature (parallel/spatial.py, SURVEY.md
§5.7) from "numerically correct" into "characterized":

1. **Memory scaling** — compile the train step unsharded and H-sharded
   over a ``space``-way mesh and compare XLA's compiled per-device peak
   temp memory (``Compiled.memory_analysis()``).  This is the compiler's
   own allocation plan, not an estimate: it demonstrates which shapes fit
   a device's HBM only when spatially sharded.

2. **Halo cost model** — for every 3×3 conv at stride 1, each partition
   boundary exchanges one row of (W, C_in) activations per neighbor
   (k//2 rows for k×k).  Per device per direction:
   ``halo_bytes = W · C_in · dtype_size``; the compute per shard is
   ``(H/space) · W · 9 · C_in · C_out · 2`` FLOPs.  The ratio — bytes
   moved over ICI per FLOP computed — decays as 1/H_shard, so halo cost
   only matters when shards get thin (H/space approaching the receptive
   field).  ``halo_table`` evaluates this for a conv stack.

Run as a script to print the committed experiment
(SPATIAL_CHARACTERIZATION.md):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m tpu_unet.tools.spatial_memory
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _train_loss_fn(model, num_classes):
    from tpu_unet.train.losses import ce_loss

    def loss_fn(variables, x, y):
        logits = model.apply(variables, x, False)
        if isinstance(logits, tuple):
            logits = logits[0]
        return ce_loss(logits.astype(jnp.float32), y,
                       tuple([1.0] * num_classes), num_classes)

    return jax.value_and_grad(loss_fn)


def compiled_peak_bytes(model_name: str, num_classes: int, shape,
                        batch: int = 1, space: int = 1) -> dict:
    """Compile loss+grad at ``shape`` and return XLA's per-device memory
    plan.  ``space > 1`` shards H over a (1, space) mesh — peak temp bytes
    are then PER DEVICE (GSPMD partitions the program before allocation)."""
    from tpu_unet.models.registry import build_model, init_model

    model = build_model(model_name, num_classes)
    variables = init_model(model, (64, 64), train=False)  # tiny init; conv
    # params are shape-independent so the 64px init applies at any size
    h, w = shape
    x = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    y = jax.ShapeDtypeStruct((batch, h, w), jnp.int32)
    fn = _train_loss_fn(model, num_classes)

    if space > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_unet.parallel.spatial import create_2d_mesh

        mesh = create_2d_mesh(1, space)
        xs = NamedSharding(mesh, P(None, "space"))
        ys = NamedSharding(mesh, P(None, "space"))
        rep = NamedSharding(mesh, P())
        vs = jax.tree_util.tree_map(lambda _: rep, variables)
        compiled = (jax.jit(fn, in_shardings=(vs, xs, ys))
                    .lower(variables, x, y).compile())
    else:
        compiled = jax.jit(fn).lower(variables, x, y).compile()
    ma = compiled.memory_analysis()
    return {
        "model": model_name, "shape": list(shape), "batch": batch,
        "space": space,
        "temp_bytes": int(ma.temp_size_in_bytes),
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
    }


def halo_table(widths, channels, h: int, w: int, space: int,
               dtype_bytes: int = 2) -> list:
    """Analytical halo-exchange ledger for a stride-1 3×3 conv stack.

    ``widths``/``channels``: per-stage (C_in, C_out) at spatial (h, w)
    divided by the stage's stride product.  Returns per-stage dicts with
    halo bytes per device, shard FLOPs, and bytes/FLOP."""
    rows = []
    for (cin, cout), stride in zip(channels, widths):
        hs, ws = h // stride, w // stride
        shard_h = hs // space
        halo = 2 * ws * cin * dtype_bytes          # one row up + one down
        flops = shard_h * ws * 9 * cin * cout * 2
        rows.append({
            "stride": stride, "cin": cin, "cout": cout,
            "shard_h": shard_h, "halo_bytes_per_dev": halo,
            "shard_gflop": flops / 1e9,
            "halo_bytes_per_mflop": halo / (flops / 1e6),
        })
    return rows


def main():
    out = {"experiment": "H-axis spatial sharding, 8 virtual CPU devices",
           "memory": [], "halo_model": None}
    # traditional UNet (the dryrun model) at a shape whose unsharded
    # backward does NOT fit one v5e chip's ~16 GB HBM budget
    for space in (1, 8):
        for shape in ((1024, 1024), (4096, 4096)):
            r = compiled_peak_bytes("traditional", 4, shape, batch=1,
                                    space=space)
            r["temp_gib"] = round(r["temp_bytes"] / 2**30, 3)
            out["memory"].append(r)
            print(f"space={space} shape={shape}: peak temp "
                  f"{r['temp_gib']} GiB/device")
    # halo ledger for the VGG16-UNet encoder at 512px, 8-way H sharding
    out["halo_model"] = halo_table(
        widths=[1, 1, 2, 2, 4, 4, 8, 8],
        channels=[(3, 64), (64, 64), (64, 128), (128, 128),
                  (128, 256), (256, 256), (256, 512), (512, 512)],
        h=512, w=512, space=8)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
