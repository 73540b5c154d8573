"""One-process train-step A/B sweep: fused-kernel region vs pure XLA,
per flagship model.  One process amortizes the (slow, tunneled) compiles.

Usage: python -m tpu_unet.tools.train_ab [quick]
Prints one JSON line per measurement.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
ITERS = 10 if QUICK else 20


def train_bench(model_name, fused, batch=8, size=512, num_classes=21):
    from tpu_unet.core import fusion
    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    fusion.set_paired_train(fused)
    fusion.set_fused_decoder(fused if not fused else None)
    try:
        model = build_model(model_name, num_classes)
        variables = init_model(model, (size, size), train=True)
        cfg = StepConfig(num_classes=num_classes,
                         cls_weights=tuple([1.0] * num_classes),
                         use_dice=True, compute_dtype=jnp.bfloat16)
        tx = make_optimizer("adam")
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, cfg)
        rng = np.random.RandomState(0)
        batch_data = {
            "image": jax.device_put(rng.randint(
                0, 255, (batch, size, size, 3)).astype(np.uint8)),
            "label": jax.device_put(rng.randint(
                0, num_classes, (batch, size, size)).astype(np.int32)),
        }
        key = jax.random.PRNGKey(0)
        state, m = step(state, batch_data, 1e-4, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, batch_data, 1e-4, key)
        float(m["loss"])
        dt = time.perf_counter() - t0
        return batch * ITERS / dt
    finally:
        fusion.set_paired_train(None)
        fusion.set_fused_decoder(None)


def main():
    out = {}
    for name, fused, tag in (
            ("unet_vgg", True, "train_vgg_fused"),
            ("unet_vgg", False, "train_vgg_xla"),
            ("unet_resnet50", True, "train_resnet50_fused"),
    ):
        try:
            v = train_bench(name, fused)
            out[tag] = round(v, 2)
            print(json.dumps({"metric": tag, "value": round(v, 2),
                              "unit": "img/s/chip"}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": tag,
                              "error": str(e)[:300]}), flush=True)
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
