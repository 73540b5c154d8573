"""Model profiling: params + FLOPs (the summary.py counterpart).

Parity target: summary.py:10-30 (torchsummary + thop, FLOPs ×2 convention).
Here FLOPs come from XLA's own compiled-cost analysis — the number the TPU
actually executes, not an operator-table estimate.
"""
from __future__ import annotations

import jax
import numpy as np

from tpu_unet.models.registry import build_model, count_params, init_model


def summarize(model_name: str, input_shape=(512, 512), num_classes: int = 21,
              batch: int = 1, verbose: bool = True):
    model = build_model(model_name, num_classes)
    variables = init_model(model, input_shape)
    params = count_params(variables)

    x = np.zeros((batch, input_shape[0], input_shape[1], 3), np.float32)

    def fwd(v, x):
        out = model.apply(v, x, False)
        return out[0] if isinstance(out, tuple) else out

    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", float("nan"))) if cost else float("nan")

    if verbose:
        print(f"model: {model_name} @ {input_shape} batch={batch}")
        print(f"Total params:  {params:,}")
        print(f"Total GFLOPs:  {flops / 1e9:.3f}")
    return {"params": params, "flops": flops}


def summarize_all(input_shape=(256, 256), num_classes: int = 4):
    """Params/GFLOPs table over the whole zoo (the get_parameters.py /
    test.py model-comparison counterpart)."""
    from tpu_unet.models.registry import MODELS

    rows = {}
    print(f"{'model':32s} {'params':>12s} {'GFLOPs':>10s}")
    for name in sorted(MODELS):
        res = summarize(name, input_shape, num_classes, verbose=False)
        rows[name] = res
        print(f"{name:32s} {res['params']:>12,d} {res['flops'] / 1e9:>10.2f}")
    return rows
