"""Reproduce / validate the deep decoder stages (resnet50 up3/up4) through
the fused wide kernels on the real chip (VERDICT r4 #2).

up4: skip (B,32,32,1024), x (B,16,16,2048), F=512  — the Mosaic
     invalid-layout shape round 4 gated to XLA.
up3: skip (B,64,64,512),  x (B,32,32,512),  F=256  — perf-gated only.

Run: python tools/repro_deep.py [up4|up3] [batch]
Prints the kernel result vs the XLA reference composition (max abs diff)
or the full compiler error.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.core import fusion


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "up4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if stage == "up4":
        Cs, Cx, F, Hs = 1024, 2048, 512, 32
    else:
        Cs, Cx, F, Hs = 512, 512, 256, 64
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    skip = jnp.asarray(rng.randn(B, Hs, Hs, Cs) * 0.1, dt)
    x = jnp.asarray(rng.randn(B, Hs // 2, Hs // 2, Cx) * 0.1, dt)
    k1 = jnp.asarray(rng.randn(3, 3, Cs + Cx, F) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.01, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, F, F) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.randn(F) * 0.01, jnp.float32)

    from tpu_unet.kernels.decoder_fuse import (_fused_unetup_fwd_impl,
                                               reference_unetup)

    ref = np.asarray(jax.jit(reference_unetup)(skip, x, k1, b1, k2, b2),
                     np.float32)
    print(f"{stage}: ref out {ref.shape}")

    fusion.set_fuse_deep(True)
    try:
        out = _fused_unetup_fwd_impl(skip, x, k1, b1, k2, b2,
                                     allow_deep=True)
        if out is None:
            print("kernel returned None (untileable)")
            return
        out = np.asarray(out, np.float32)
        diff = np.abs(out - ref).max()
        print(f"fused out {out.shape}, max|diff| vs XLA = {diff:.3e}")
    except Exception as e:
        print(f"KERNEL FAILED: {type(e).__name__}")
        print(str(e)[:4000])
    finally:
        fusion.set_fuse_deep(None)


if __name__ == "__main__":
    main()
