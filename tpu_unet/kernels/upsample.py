"""Pallas exact ×2 align-corners bilinear upsample (decoder hot path).

The XLA einsum formulation (tpu_unet/nn/resize.py) is correct and fast,
but HLO inspection shows each W-axis contraction costs two full relayout
copies (lane dim moves W↔C) plus an MXU conv.  This kernel instead:

- streams input rows HBM→VMEM with manual DMA (only the ~BH/2+2 rows a
  block of BH output rows needs),
- H-lerps row pairs on the VPU,
- W-expands in VMEM via repeat + roll + select (the ×2 align-corners
  index map satisfies i0(o) ∈ {⌊o/2⌋−1, ⌊o/2⌋}, so both gather operands
  are shifts of the 2-repeated row; positions where the clamped-i1 case
  could matter have weight 0),

so the only HBM traffic is one read of x and one write of the 4× output —
no relayouts, no MXU.

STATUS (measured on v5e, batch 8, bf16, per-op timings include a ~3 ms
tunnel sync floor): both the per-row v1 and the fully-vectorized v2
(interleave + static-shift + select on both axes, no loops) are exact but
measure at or slightly above the einsum path (v2: 3.7-5.0 ms vs einsum
3.1-3.3 ms across decoder shapes), and Mosaic rejects the 256²-row blocks.
Conclusion for this hardware/toolchain: the XLA einsum in
tpu_unet/nn/resize.py IS the fast path — per-op sync-floor analysis shows
the decoder resizes cost well under 1 ms each, i.e. resize is no longer a
meaningful share of the 512px step.  Both kernels stay as exact,
interpret-tested references for future Mosaic revisions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.nn.resize import _lerp_coeffs


def _make_kernel(H: int, BH: int, win: int, out_dtype):
    two_h = 2 * H

    def kernel(hw_ref, wmask_ref, ww_ref, x_hbm, out_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * BH
        # input window start, clamped so the full window is in range
        a = jnp.clip(r0 // 2 - 1, 0, H - win)
        dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(a, win)], scratch, sem)
        dma.start()
        dma.wait()

        wmask = wmask_ref[...] != 0          # (2W, 1)
        wv = ww_ref[...]                     # (2W, 1) f32

        def row(jl, _):
            j = r0 + jl
            i0 = (j * (H - 1)) // (two_h - 1)
            i1 = jnp.minimum(i0 + 1, H - 1)
            hw = hw_ref[j, 0]                # f32 weight, from SMEM
            lo = scratch[pl.ds(i0 - a, 1)][0].astype(jnp.float32)
            hi = scratch[pl.ds(i1 - a, 1)][0].astype(jnp.float32)
            hrow = lo + (hi - lo) * hw       # (W, C)
            # interleaved repeat rep[o] = hrow[o//2] (pltpu.repeat is a
            # tile-concat, not an interleave)
            rep = jnp.concatenate(
                [hrow[:, None, :], hrow[:, None, :]], axis=1
            ).reshape(2 * hrow.shape[0], hrow.shape[1])
            # pltpu.roll requires non-negative shifts; -2 ≡ 2W-2 circularly
            wlo = jnp.where(wmask, pltpu.roll(rep, 2, axis=0), rep)
            whi = jnp.where(wmask, rep,
                            pltpu.roll(rep, rep.shape[0] - 2, axis=0))
            out = wlo + (whi - wlo) * wv
            out_ref[0, pl.ds(jl, 1)] = out[None].astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, BH, row, 0)

    return kernel


# ---------------------------------------------------------------------------
# v2: fully vectorized — no per-row loop.  The H axis uses the same
# interleave + static-shift + select identity as the W axis, applied to a
# DMA'd input row-window; the input is edge-padded by one row on each side
# so every window is in range with a static size.  All indices are static
# slices of the interleaved window (for output rows [r0, r0+BH), the
# global identity lo[j] = select(δ(j), rep[j−2], rep[j]) becomes
# lo = select(δ_blk, repw[0:BH], repw[2:BH+2]) with repw the interleaved
# window starting at row r0//2 of the padded input).
# ---------------------------------------------------------------------------

def _interleave(x, axis: int):
    """out[2i], out[2i+1] = x[i] along ``axis``."""
    xe = jnp.expand_dims(x, axis + 1)
    rep = jnp.concatenate([xe, xe], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return rep.reshape(shape)


def _shift2(x, axis: int):
    """out[i] = x[i+2] along ``axis`` (tail edge-extended)."""
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(2, n)
    head = x[tuple(idx)]
    idx[axis] = slice(n - 2, n)
    return jnp.concatenate([head, x[tuple(idx)]], axis=axis)


def _make_kernel_v2(H: int, BH: int, win: int, out_dtype):
    def kernel(hmask_ref, hw_ref, wmask_ref, ww_ref, xp_hbm, out_ref,
               scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * BH
        a = r0 // 2  # window start in the padded input (pad-top = 1)
        dma = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(a, win)], scratch, sem)
        dma.start()
        dma.wait()

        window = scratch[...].astype(jnp.float32)      # (win, W, C)
        repw = _interleave(window, 0)                  # (2*win, W, C)
        # block slice of the per-output-row H masks/weights
        hmask = hmask_ref[pl.ds(r0, BH)] != 0          # (BH, 1, 1)... (BH,1)
        hw = hw_ref[pl.ds(r0, BH)]                     # (BH, 1)
        hmask3 = hmask[:, :, None]
        hw3 = hw[:, :, None]
        # global rep index for local row jl is jl + (r0 − 2a) + 2*pad = jl+2
        # when r0 even; r0 is always even (BH even), pad contributes +2
        lo = jnp.where(hmask3, repw[0:BH], repw[2:BH + 2])
        hi = jnp.where(hmask3, repw[2:BH + 2], repw[4:BH + 4])
        hrows = lo + (hi - lo) * hw3                   # (BH, W, C)

        wmask = (wmask_ref[...] != 0)[None, :, :]      # (1, 2W, 1)
        wv = ww_ref[...][None, :, :]                   # (1, 2W, 1)
        repc = _interleave(hrows, 1)                   # (BH, 2W, C)
        back2 = jnp.concatenate(
            [repc[:, :2], repc[:, :-2]], axis=1)       # rep[o-2], head-pad
        fwd2 = _shift2(repc, 1)                        # rep[o+2]
        wlo = jnp.where(wmask, back2, repc)
        whi = jnp.where(wmask, repc, fwd2)
        out = wlo + (whi - wlo) * wv
        out_ref[0] = out.astype(out_dtype)

    return kernel


def pallas_upsample2x_v2(x, block_rows: int = 0, interpret: bool = False):
    """Vectorized exact ×2 align-corners upsample (see module notes)."""
    b, h, w, c = x.shape
    out_h, out_w = 2 * h, 2 * w
    if not block_rows:
        # size the output block to ~1.5 MB f32 working tiles
        block_rows = max(2, (3 << 19) // max(2 * w * c * 4, 1))
    bh = min(block_rows, out_h)
    while out_h % bh or bh % 2:
        bh -= 1 if bh > 2 else 0
        if bh <= 2:
            bh = 2
            break
    win = bh // 2 + 3
    # pad one edge row each side so every window has static size/offset
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:], x[:, -1:]], axis=1)

    i0, _, hwts = _lerp_coeffs(h, out_h, True)
    hdelta = (np.arange(out_h) // 2 - i0).astype(np.int32).reshape(-1, 1)
    hw = hwts.astype(np.float32).reshape(-1, 1)
    wmask, wv = _wcoefs(w)

    out = pl.pallas_call(
        _make_kernel_v2(h, bh, win, x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        grid=(b, out_h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h delta mask (2H, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h weights (2H, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w delta mask (2W, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w weights (2W, 1)
            pl.BlockSpec(memory_space=pl.ANY),       # padded x in HBM
        ],
        out_specs=pl.BlockSpec((1, bh, out_w, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, w, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(jnp.asarray(hdelta), jnp.asarray(hw), jnp.asarray(wmask),
      jnp.asarray(wv), xp)
    return out


@functools.lru_cache(maxsize=None)
def _wcoefs(in_size: int):
    """(delta-mask, weight) arrays for the W axis of a ×2 upsample."""
    out_size = 2 * in_size
    i0, _, w = _lerp_coeffs(in_size, out_size, True)
    delta = (np.arange(out_size) // 2 - i0).astype(np.int32)
    return delta.reshape(-1, 1), w.astype(np.float32).reshape(-1, 1)


def pallas_upsample2x(x, block_rows: int = 32, interpret: bool = False):
    """Exact align-corners ×2 bilinear upsample of NHWC ``x``."""
    b, h, w, c = x.shape
    out_h, out_w = 2 * h, 2 * w
    bh = min(block_rows, out_h)
    while out_h % bh:
        bh //= 2
    win = min(bh // 2 + 2, h)
    _, _, hwts = _lerp_coeffs(h, out_h, True)
    hw = hwts.astype(np.float32).reshape(-1, 1)
    wmask, wv = _wcoefs(w)

    out = pl.pallas_call(
        _make_kernel(h, bh, win, x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        grid=(b, out_h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # h weights (2H, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w delta mask (2W, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w weights (2W, 1)
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, bh, out_w, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, w, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(jnp.asarray(hw), jnp.asarray(wmask), jnp.asarray(wv), x)
    return out
