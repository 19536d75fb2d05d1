"""Long-L flash backward vs the XLA fallback it replaces, isolated, on
identical inputs at the 756px shape (bs16, L=2917 -> Lp=2944, bf16).

Before round 11 the whole-KV flash backward was VMEM-infeasible at this
length (`_bwd_block_q` -> None) and differentiated 756px paths paid
`_xla_attention_packed_bwd` — which materialises the (B, nh, L, L)
probability matrix in HBM (16 x 12 x 2944^2 f32 tiles).  The KV-blocked
backward (`_pallas_attention_packed_bwd_longl`) recomputes probabilities
per (block_q x block_k) tile from the forward's saved f32 denominators.

Usage: python scripts/microbench/bench_bwd_longl.py [B] [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.ops import attention as A

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 2917
D, NH = 768, 12


def marginal(fn, iters=4, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(iters + 1); bm = min(bm, time.perf_counter() - t0)
    return (bm - b1) / iters


def main():
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    q, k, v, do = (
        jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32), dtype=dtype)
        for _ in range(4)
    )
    scale = 64.0**-0.5
    o, den = jax.jit(
        lambda a, b_, c: A._pallas_attention_packed_stats(a, b_, c, NH, scale)
    )(q, k, v)
    lp = A._ceil_to(L, 128)
    bq, bk = A._pick_2d_blocks(lp)
    f_bwd = 10 * B * L * L * D  # model flops of the one-pass backward
    print(
        f"backend={jax.default_backend()} B={B} L={L} Lp={lp} "
        f"blocks=({bq},{bk}) wholekv_law="
        f"{A._bwd_block_q(lp, jnp.dtype(dtype).itemsize)}"
    )

    # operands are jit ARGS, not closures: closed-over arrays bake into the
    # program as constants and blow up the axon remote-compile payload
    # (observed HTTP 413)
    @jax.jit
    def longl_loop(q, k, v, o, do, den, n):
        def body(_, acc):
            dq, dk, dv = A._pallas_attention_packed_bwd_longl(
                q + acc.astype(q.dtype) * 1e-9, k, v, o, do, den, NH, scale
            )
            return acc + (jnp.sum(dq**2) + jnp.sum(dk**2) + jnp.sum(dv**2)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def xla_loop(q, k, v, o, do, den, n):
        def body(_, acc):
            dq, dk, dv = A._xla_attention_packed_bwd(
                q + acc.astype(q.dtype) * 1e-9, k, v, o, do, NH, scale
            )
            return acc + (jnp.sum(dq**2) + jnp.sum(dk**2) + jnp.sum(dv**2)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def wholekv_loop(q, k, v, o, do, den, n):
        def body(_, acc):
            dq, dk, dv = A._pallas_attention_packed_bwd(
                q + acc.astype(q.dtype) * 1e-9, k, v, o, do, NH, scale
            )
            return acc + (jnp.sum(dq**2) + jnp.sum(dk**2) + jnp.sum(dv**2)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    variants = [("longl-flash", longl_loop), ("xla-fallback", xla_loop)]
    if A._bwd_block_q(lp, jnp.dtype(dtype).itemsize) is not None:
        variants.append(("wholekv-flash", wholekv_loop))
    for name, loop in variants:
        try:
            float(loop(q, k, v, o, do, den, 1))
        except Exception as e:
            print(f"{name:13s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}")
            continue
        t = marginal(lambda n, lo=loop: float(lo(q, k, v, o, do, den, n)))
        print(f"{name:13s} {t*1e3:8.2f} ms  {f_bwd/t/1e12:6.1f} TFLOP/s (model)")


if __name__ == "__main__":
    main()
