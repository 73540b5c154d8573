"""Mixed-precision policy.

TPU-native replacement for torch.cuda.amp autocast + GradScaler
(reference: train.py:325-329, utils/utils_fit.py:64-94).  On TPU the MXU
natively accumulates bf16 matmuls in f32, so no loss scaling is needed:
params/optimizer state stay f32, compute runs bf16.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # dtype used for softmax / loss / metric reductions
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_PRECISION = Precision()
BF16_PRECISION = Precision(compute_dtype=jnp.bfloat16)


def resolve(fp16: bool) -> Precision:
    """Map the reference's ``fp16`` training flag to a TPU policy."""
    return BF16_PRECISION if fp16 else DEFAULT_PRECISION
