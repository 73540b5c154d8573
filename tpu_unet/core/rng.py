"""Deterministic PRNG plumbing.

Replaces the reference's seed_everything / worker_init_fn machinery
(utils/utils.py:46-62): JAX is deterministic by construction, so one root
key threaded through named streams is the whole story.
"""
from __future__ import annotations

import zlib

import jax


class RngStream:
    """Split a root key into named, per-step streams."""

    def __init__(self, seed: int = 11):
        self.root = jax.random.PRNGKey(seed)

    def step_key(self, step: int, name: str = "dropout"):
        k = jax.random.fold_in(self.root, step)
        # crc32, not hash(): Python's str hash is salted per process, which
        # would desync multi-host replicas and break run-to-run determinism
        return jax.random.fold_in(k, zlib.crc32(name.encode()) % (2**31))

    def split(self, n: int = 2):
        keys = jax.random.split(self.root, n + 1)
        self.root = keys[0]
        return keys[1:]
