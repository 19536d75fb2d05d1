"""Sweep (block_q, block_k) for the long-L backward at the 756px shape.

`_pick_2d_blocks` caps the f32 score tile at ~1.5MB with bq<=512; this
measures neighbouring legal configurations (divisors of Lp=2944, %16) to
check the heuristic against the hardware.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.ops import attention as A

B, L, D, NH = 16, 2917, 768, 12


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
    f_bwd = 10 * B * L * L * D
    print(f"backend={jax.default_backend()} B={B} L={L}")

    real = A._pick_2d_blocks
    try:
        for bq, bk in ((736, 736), (736, 1472), (1472, 736), (368, 1472),
                       (1472, 1472), (368, 2944), (736, 2944)):
            A._pick_2d_blocks = lambda lp, _bq=bq, _bk=bk: (_bq, _bk)
            jax.clear_caches()

            @jax.jit
            def loop(q, k, v, o, do, den, n):
                def body(_, acc):
                    dq, dk, dv = A._pallas_attention_packed_bwd_longl(
                        q + acc.astype(q.dtype) * 1e-9, k, v, o, do, den,
                        NH, scale,
                    )
                    return acc + (
                        jnp.sum(dq**2) + jnp.sum(dk**2) + jnp.sum(dv**2)
                    ) * 1e-12
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            try:
                float(loop(q, k, v, o, do, den, 1))
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:80]}")
                continue
            t = marginal(lambda n: float(loop(q, k, v, o, do, den, n)))
            print(f"bq={bq:5d} bk={bk:5d}  {t*1e3:8.2f} ms  "
                  f"{f_bwd/t/1e12:6.1f} TFLOP/s (model)")
    finally:
        A._pick_2d_blocks = real


if __name__ == "__main__":
    main()
