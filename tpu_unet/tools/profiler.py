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


def summarize_xplane(xplane_path: str, top: int = 15):
    """Per-op exclusive device-time summary from a jax.profiler trace.

    Works around this image's tensorboard_plugin_profile/TF version mismatch
    by parsing the XSpace proto directly (needs
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the fast proto
    runtime rejects the generated code).  Returns {op_name: seconds} from
    the device's "XLA Ops" line; prints the top entries.

    Round-1 finding for the 512px VGG-UNet forward (3 iters traced):
    102 ms fusions + 22 ms pure layout copies — the copies are the
    resize-conv W↔C relayouts, ~17% of the step.
    """
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    agg = collections.Counter()
    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        ev_names = p.event_metadata
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[ev_names[ev.metadata_id].name] += ev.duration_ps
    result = {k: v / 1e12 for k, v in agg.items()}
    for name, sec in sorted(result.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{sec * 1e3:9.2f} ms  {name[:110]}")
    return result


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
