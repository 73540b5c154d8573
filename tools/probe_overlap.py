"""Probe: does Mosaic overlap INDEPENDENT VPU and MXU chains inside one
kernel body?  (VERDICT r4 #1 — the prescribed attack on the ~6 ms/step of
VPU serialization is pipelining tile t+1's lerp/window builds against tile
t's matmuls; that only works if the scheduler actually co-issues
independent VPU and MXU chains.)

Four kernels over identical data volumes, timed on the real chip:
  vpu_only   — N reps of a shifted-lerp chain (the upsample idiom)
  mxu_only   — N reps of a (R, C) x (C, F) bf16 matmul chain
  dep        — N reps of lerp chain → matmul (the current kernels' shape:
               every matmul consumes the VPU chain before it)
  indep      — N reps of lerp chain on stream A + matmul on stream B,
               with NO cross-dependency until a final combine

If t(indep) ≈ max(t_vpu, t_mxu): Mosaic overlaps → restructuring the
decoder kernels into a 2-tile software pipeline is worth doing.
If t(indep) ≈ t_vpu + t_mxu ≈ t(dep): the units serialize at the
instruction-stream level → record the reject with these numbers.

Run: python tools/probe_overlap.py [reps] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, F = 256, 512, 512   # rows x channels, matmul to F
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def _lerp_chain(a, w):
    """The decoder kernels' VPU idiom: shifted lerps + select + mask."""
    am1 = jnp.concatenate([a[:1], a[:-1]], axis=0)
    ap1 = jnp.concatenate([a[1:], a[-1:]], axis=0)
    e = am1 + (a - am1) * w
    o = a + (ap1 - a) * w
    sel = w > 0.5
    m = jnp.where(sel, e, o)
    return jnp.where(m > 0, m, 0.0) * w + jnp.where(sel, o, e)


def vpu_kernel(a_ref, w_ref, o_ref):
    a = a_ref[...]
    w = w_ref[...]
    acc = jnp.zeros_like(a)
    for _ in range(REPS):
        a = _lerp_chain(a, w)
        acc = acc + a
    o_ref[...] = acc


def mxu_kernel(b_ref, k_ref, o_ref):
    b = b_ref[...]
    acc = jnp.zeros((R, F), jnp.float32)
    for i in range(REPS):
        acc = acc + jax.lax.dot_general(
            b, k_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = acc[:, :C].astype(b.dtype)   # serialize the matmuls
    o_ref[...] = acc


def dep_kernel(a_ref, w_ref, k_ref, o_ref):
    """lerp chain feeds each matmul (today's kernel structure)."""
    a = a_ref[...]
    w = w_ref[...]
    acc = jnp.zeros((R, F), jnp.float32)
    for i in range(REPS):
        a = _lerp_chain(a, w)
        acc = acc + jax.lax.dot_general(
            a.astype(jnp.bfloat16), k_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def indep_kernel(a_ref, w_ref, b_ref, k_ref, o_ref):
    """Stream A: the VPU chain.  Stream B: the matmul chain.  No
    dependency between them until the final add."""
    a = a_ref[...]
    w = w_ref[...]
    b = b_ref[...]
    accv = jnp.zeros_like(a)
    accm = jnp.zeros((R, F), jnp.float32)
    for i in range(REPS):
        a = _lerp_chain(a, w)
        accv = accv + a
        accm = accm + jax.lax.dot_general(
            b, k_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = accm[:, :C].astype(b.dtype)
    o_ref[...] = accm + accv[:, :F]


def _run(name, kernel, args, out_shape):
    """Times the kernel via a scan burst whose FIRST operand is chained
    through the previous iteration's output — without the data dependency
    XLA hoists the (pure, identical-input) pallas_call out of the scan
    and the burst measures one call instead of 20.  Requires C == F."""
    fn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    first = args[0]

    def burst(*a):
        def body(c, _):
            out = fn(c, *a[1:])
            nxt = out[:, :C].astype(first.dtype) * 1e-3  # keep bounded
            return nxt, ()
        last, _ = jax.lax.scan(body, a[0], None, length=100)
        return last

    jb = jax.jit(burst)
    # NB: on the tunneled backend block_until_ready does not reliably
    # wait — a tiny np.asarray FETCH is the only true synchronization
    np.asarray(jb(*args)[0, :8])
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = jb(*args)
        np.asarray(r[0, :8])
        ts.append((time.perf_counter() - t0) / 100)
    t = min(ts) * 1e6
    print(f"{name:10s}: {t:8.1f} us/call")
    return t


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(R, C), jnp.float32)
    w = jnp.asarray(rng.rand(R, C), jnp.float32)
    b = jnp.asarray(rng.randn(R, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(REPS, C, F), jnp.bfloat16)

    tv = _run("vpu_only", vpu_kernel, (a, w),
              jax.ShapeDtypeStruct((R, C), jnp.float32))
    tm = _run("mxu_only", mxu_kernel, (b, k),
              jax.ShapeDtypeStruct((R, F), jnp.float32))
    td = _run("dep", dep_kernel, (a, w, k),
              jax.ShapeDtypeStruct((R, F), jnp.float32))
    ti = _run("indep", indep_kernel, (a, w, b, k),
              jax.ShapeDtypeStruct((R, F), jnp.float32))
    print(f"\nsum(vpu, mxu) = {tv + tm:.1f} us   max = {max(tv, tm):.1f} us")
    print(f"indep/sum = {ti / (tv + tm):.2f}  "
          f"(1.0 → serialized, {max(tv, tm) / (tv + tm):.2f} → full overlap)")
    print(f"dep/sum   = {td / (tv + tm):.2f}")


if __name__ == "__main__":
    main()
