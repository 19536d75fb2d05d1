"""Sweep the flash-backward q-block size at the LoRA hot shape (bf16,
B=16, L=1370 -> Lp=1408) — the scoped-vmem law picks the largest fitting
block; this measures whether a smaller one pipelines better.

Monkeypatches ops.attention._bwd_block_q per candidate and times the raw
backward kernel via the bench methodology (loop inside jit, perturbed
inputs, marginal minima).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.ops import attention as A

B, L, D, NH = 16, 1370, 768, 12


def marginal(fn, iters=8, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(iters + 1); bm = min(bm, time.perf_counter() - t0)
    return (bm - b1) / iters


def main():
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    q, k, v, o, do = (
        jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32), dtype=dtype)
        for _ in range(5)
    )
    scale = 64.0**-0.5
    lp = A._ceil_to(L, 128)
    law = A._bwd_block_q(lp, jnp.dtype(dtype).itemsize)
    print(f"backend={jax.default_backend()} dtype={jnp.dtype(dtype).name} "
          f"Lp={lp} law_block={law}")

    real = A._bwd_block_q
    f_bwd = 10 * B * L * L * D
    try:
        for bq in (88, 176, 352, 704, 1408):
            if lp % bq or bq % 16:
                continue
            A._bwd_block_q = lambda _lp, _it, _bq=bq: _bq
            jax.clear_caches()

            @jax.jit
            def loop(q, n):
                def body(_, acc):
                    dq, dk, dv = A._pallas_attention_packed_bwd(
                        q + acc * 1e-9, k, v, o, do, NH, scale
                    )
                    return acc + (
                        jnp.sum(dq**2) + jnp.sum(dk**2) + jnp.sum(dv**2)
                    ) * 1e-12
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            try:
                float(loop(q, 1))
            except Exception as e:
                print(f"block={bq:5d}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}")
                continue
            t = marginal(lambda n: float(loop(q, n)))
            print(f"block={bq:5d}  {t*1e3:7.2f} ms  {f_bwd/t/1e12:6.1f} TFLOP/s")
    finally:
        A._bwd_block_q = real


if __name__ == "__main__":
    main()
