"""Per-flagship benchmark artifact writer.

Runs every headline configuration and emits machine-readable JSON — one
object per line plus a combined file — so round artifacts carry ALL the
numbers, not just the unet_vgg headline (the recorded-metrics discipline
of the reference's results__exported .py:48-55).

Inference entries drive the PUBLIC serving path (bench.py::build_forward →
infer.wrapper.Unet.serving_step) under bench.py's exact burst protocol;
the train entry is tools/train_bench.py's per-call protocol.

Usage (on TPU):  python -m tpu_unet.tools.bench_all [out.json]
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import numpy as np

# (model, batch, size, num_classes) — the headline set: the two canonical
# flagships at the north-star shape, and the two competition models at the
# reference's published-FPS shape (BASELINE.md #5/#6)
INFERENCE_SET = [
    ("unet_vgg", 8, 512, 21),
    ("unet_resnet50", 8, 512, 21),
    ("traditional", 32, 256, 4),
    ("ultralight_large_optimized", 32, 256, 4),
]
# reference GPU bs=1 FPS for vs_reference (Submit_result/关键指标数据文档.txt)
REFERENCE_FPS = {"traditional": 82.75, "ultralight_large_optimized": 105.41}


def bench_inference(model_name: str, batch: int, size: int,
                    num_classes: int) -> dict:
    """bench.py's burst20scan-x3-median protocol at an arbitrary shape."""
    import jax.numpy as jnp

    from bench import build_forward

    rng = np.random.RandomState(0)
    pool = [jax.device_put(rng.randint(0, 255, (batch, size, size, 3)
                                       ).astype(np.uint8)) for _ in range(4)]
    step, variables = build_forward(batch, size, num_classes, model_name)
    hist = np.asarray(step(variables, pool[0]))
    assert hist.sum() == batch * size * size

    stack = jnp.stack(pool)
    iters = 20

    @functools.partial(jax.jit, static_argnums=2)
    def stepn(variables, imgs_stack, n):
        def body(carry, i):
            imgs = jax.lax.dynamic_index_in_dim(imgs_stack, i % 4, 0,
                                                keepdims=False)
            return carry, step(variables, imgs)
        _, hists = jax.lax.scan(body, 0, jnp.arange(n))
        return hists

    np.asarray(stepn(variables, stack, iters))  # compile + warmup
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(stepn(variables, stack, iters))
        rates.append(batch * iters / (time.perf_counter() - t0))
        time.sleep(0.5)
    ips = sorted(rates)[1] / max(jax.device_count(), 1)
    entry = {
        "metric": f"{model_name}_{size}px_e2e_inference",
        "value": round(ips, 2), "unit": "images/sec/chip",
        "batch": batch,
        "protocol": "burst20scan-x3-median,device-resident-io,"
                    "public-serving-path",
    }
    if model_name in REFERENCE_FPS:
        entry["vs_reference_gpu_bs1"] = round(ips / REFERENCE_FPS[model_name],
                                              2)
    if size == 512:
        entry["vs_baseline"] = round(ips / 625.0, 4)
    return entry


def main(out_path: str = "BENCH_DETAIL.json"):
    from tpu_unet.core.cache import enable_compilation_cache

    enable_compilation_cache()
    entries = []
    for model_name, batch, size, nc in INFERENCE_SET:
        e = bench_inference(model_name, batch, size, nc)
        print(json.dumps(e))
        entries.append(e)

    from tpu_unet.tools.train_bench import bench_train_step

    for tb in (8, 16):
        tr = bench_train_step("unet_vgg", batch=tb, size=512, iters=10)
        entry = {
            "metric": f"unet_vgg_512px_train_step_b{tb}",
            "value": round(tr["train_images_per_sec_per_chip"], 2),
            "unit": "images/sec/chip", "batch": tb,
            "protocol": tr["protocol"],
        }
        print(json.dumps(entry))
        entries.append(entry)

    trr = bench_train_step("unet_resnet50", batch=16, size=512, iters=10)
    entry = {
        "metric": "unet_resnet50_512px_train_step_b16",
        "value": round(trr["train_images_per_sec_per_chip"], 2),
        "unit": "images/sec/chip", "batch": 16, "protocol": trr["protocol"],
    }
    print(json.dumps(entry))
    entries.append(entry)

    tr2 = bench_train_step("ultralight_large_optimized", batch=32, size=256,
                           num_classes=4, iters=10)
    entry = {
        "metric": "ultralight_large_optimized_256px_train_step",
        "value": round(tr2["train_images_per_sec_per_chip"], 2),
        "unit": "images/sec/chip", "batch": 32, "protocol": tr2["protocol"],
    }
    print(json.dumps(entry))
    entries.append(entry)

    with open(out_path, "w") as f:
        json.dump(entries, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json")
