"""Training-step throughput harness (the other half of BASELINE.json's
"inference + train step" metric): images/sec/chip for the full jitted SPMD
train step (forward + loss + backward + optimizer update + BN stats).

Dispatch protocol: per-call by default — one launch per step, exactly how
``fit()`` drives training in production, with JAX async dispatch hiding
the enqueue cost behind the ~80 ms device step (unlike the inference
bench, whose ~23 ms step IS relay-bound per-call; see bench.py).
``scan=True`` runs the window as ONE ``lax.scan`` launch for A/B — but
note the VGG flagship's up4 paired backward does not fit VMEM inside a
while-loop body on v5e (its f32 wgrad accumulator windows total ~85 MB;
the loop context adds ~8 MB and tips the 128 MB cap), so scan mode OOMs
at compile time there.  Measure other models/sizes with it, or
``TPU_UNET_PAIRED_TRAIN=0``.
"""
from __future__ import annotations

import functools
import time

import jax
import numpy as np


def bench_train_step(model_name: str = "unet_vgg", batch: int = 8,
                     size: int = 512, num_classes: int = 21,
                     iters: int = 10, bf16: bool = True, scan: bool = False):
    import jax.numpy as jnp

    from tpu_unet.core.cache import enable_compilation_cache
    from tpu_unet.models.registry import build_model, init_model

    enable_compilation_cache()
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    model = build_model(model_name, num_classes)
    variables = init_model(model, (size, size), train=True)
    cfg = StepConfig(num_classes=num_classes,
                     cls_weights=tuple([1.0] * num_classes), use_dice=True,
                     compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    tx = make_optimizer("adam")
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, cfg)

    rng = np.random.RandomState(0)
    batch_data = {
        "image": jax.device_put(
            rng.randint(0, 255, (batch, size, size, 3)).astype(np.uint8)),
        "label": jax.device_put(
            rng.randint(0, num_classes, (batch, size, size)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch_data, 1e-4, key)  # compile
    float(m["loss"])

    if scan:
        @functools.partial(jax.jit, donate_argnums=0, static_argnums=4)
        def stepn(state, batch_data, lr, key, n):
            def body(s, _):
                s2, m2 = step(s, batch_data, lr, key)  # jit-of-jit inlines
                return s2, m2["loss"]
            return jax.lax.scan(body, state, None, length=n)

        state, losses = stepn(state, batch_data, 1e-4, key, iters)  # compile
        float(losses[-1])
        rates = []
        for _ in range(3):  # median of three windows (relay noise)
            t0 = time.perf_counter()
            state, losses = stepn(state, batch_data, 1e-4, key, iters)
            float(losses[-1])
            dt = time.perf_counter() - t0
            rates.append(batch * iters / dt)
        ips = sorted(rates)[1]
        protocol = f"scan{iters}-x3-median"
    else:
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch_data, 1e-4, key)
        float(m["loss"])
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        protocol = f"percall{iters}"
    out = {"model": model_name, "batch": batch, "size": size,
           "train_images_per_sec_per_chip": ips / max(jax.device_count(), 1),
           "protocol": protocol}
    print(out)
    return out


if __name__ == "__main__":
    import sys

    bench_train_step(
        model_name=sys.argv[1] if len(sys.argv) > 1 else "unet_vgg",
        batch=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
        scan=(sys.argv[3] == "scan") if len(sys.argv) > 3 else False,
    )
