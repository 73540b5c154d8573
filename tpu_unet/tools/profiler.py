"""Profiling harness (SURVEY.md §5.1).

The reference has only the get_FPS stopwatch (unet.py:205-258); the TPU
build gets a real timeline: jax.profiler traces viewable in TensorBoard /
Perfetto, plus a steps/sec + images/sec/chip measurement helper.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_unet_trace"):
    """Capture an XLA/TPU timeline trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {log_dir}")


def measure_throughput(fn, args, batch_size: int, iters: int = 20,
                       warmup: int = 2):
    """steps/sec and images/sec/chip for a jitted step."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    steps_per_sec = iters / dt
    ips = steps_per_sec * batch_size
    return {
        "steps_per_sec": steps_per_sec,
        "images_per_sec": ips,
        "images_per_sec_per_chip": ips / max(jax.device_count(), 1),
    }
