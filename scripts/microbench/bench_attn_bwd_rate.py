"""Isolated achieved rate of the flash-attention forward and backward
kernels at the LoRA hot-path shape (bs16 @ 518px ViT-B: B=16, L=1370,
D=768, 12 heads, head_dim 64) — the denominator for the LoRA step's
pinned MFU floor analysis (ROADMAP round 11).

Times fwd alone and fwd+bwd (jax.grad) with the bench.py methodology
(loop inside jit, perturbed inputs, marginal minima), then reports each
phase's achieved TFLOP/s against its analytic flops:
    fwd  = 4 B L^2 D            (scores + PV)
    bwd  = 10 B L^2 D           (s recompute, dp, dq, dk, dv)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.ops.attention import multi_head_attention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 1370
D, NH = 768, 12


def marginal(fn, iters=8, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(iters + 1); bm = min(bm, time.perf_counter() - t0)
    return (bm - b1) / iters


def main():
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32), dtype=dtype)
        for _ in range(3)
    )
    scale = 64.0**-0.5

    @jax.jit
    def fwd_loop(q, n):
        def body(_, acc):
            o = multi_head_attention(q + acc * 1e-9, k, v, NH, scale=scale)
            return acc + jnp.sum(o.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def fwdbwd_loop(q, n):
        def body(_, acc):
            g = jax.grad(
                lambda qq: jnp.sum(
                    multi_head_attention(qq, k, v, NH, scale=scale).astype(
                        jnp.float32
                    )
                    ** 2
                )
            )(q + acc * 1e-9)
            return acc + jnp.sum(g.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(fwd_loop(q, 1)); float(fwdbwd_loop(q, 1))  # compile + warm
    t_fwd = marginal(lambda n: float(fwd_loop(q, n)))
    t_both = marginal(lambda n: float(fwdbwd_loop(q, n)))
    t_bwd = t_both - t_fwd

    f_fwd = 4 * B * L * L * D
    f_bwd = 10 * B * L * L * D
    print(
        f"backend={jax.default_backend()} dtype={jnp.dtype(dtype).name} "
        f"B={B} L={L} D={D} heads={NH}"
    )
    print(f"fwd     {t_fwd*1e3:7.2f} ms  {f_fwd/t_fwd/1e12:6.1f} TFLOP/s")
    print(f"fwd+bwd {t_both*1e3:7.2f} ms")
    print(f"bwd     {t_bwd*1e3:7.2f} ms  {f_bwd/t_bwd/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
