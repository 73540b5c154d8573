"""Capture a per-op device-time profile of the public serving forward
(or the train step with 'train') and print the top ops.

Usage (TPU): python tools/profile_forward.py [unet_vgg|train] [batch]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "unet_vgg"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = 512
    from tpu_unet.core.cache import enable_compilation_cache
    from tpu_unet.tools.profiler import summarize_xplane, trace

    enable_compilation_cache()
    rng = np.random.RandomState(0)

    if mode == "train":
        from tpu_unet.tools.train_bench import bench_train_step

        # reuse the bench harness under a trace: 6 timed steps
        with trace("/tmp/tpu_unet_trace_train") as d:
            bench_train_step("unet_vgg", batch=batch, size=size, iters=6)
        logdir = d
    else:
        from bench import build_forward

        step, variables = build_forward(batch, size, model_name=mode)
        imgs = jax.device_put(rng.randint(0, 255, (batch, size, size, 3)
                                          ).astype(np.uint8))
        np.asarray(step(variables, imgs))  # compile
        with trace("/tmp/tpu_unet_trace_fwd") as d:
            for _ in range(6):
                h = step(variables, imgs)
            np.asarray(h)
        logdir = d

    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {logdir}"
    summarize_xplane(paths[-1], top=40)


if __name__ == "__main__":
    main()
