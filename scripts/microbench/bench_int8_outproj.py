"""Controlled same-process A/B of the fused quant+dense attention
out-projection on the composed int8 forward (bs32 @ 518px) — back-to-back
in one process so tunnel/host drift cannot masquerade as a kernel delta
(BENCH runs 20 minutes apart showed the unchanged raw-chain control moving
4.6%).

A: dense_quant_w8a8 (Pallas fused quantize+dot, the round-11 kernel)
B: ops/quant.dense_w8a8 (unfused: XLA quantize pass + int8 dot)

Toggled via UCOD_INT8_UNFUSED_OUTPROJ (read at trace time in
models/dino.py) with a cache clear between variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.ops.quant import quantize_dino_linears

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 518


def marginal(fn, iters=8, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(iters + 1); bm = min(bm, time.perf_counter() - t0)
    return (bm - b1) / iters


def build(cfg, params, qparams, dtype):
    @jax.jit
    def loop(px, n):
        def body(_, acc):
            out = dino_forward(
                params, px + acc * 1e-9, cfg, compute_dtype=dtype, quant=qparams
            )["key_features"]
            return acc + jnp.sum(out.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return loop


def main():
    cfg = DinoConfig.dinov2_base()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = init_dino(jax.random.PRNGKey(1), cfg)
    qparams = jax.jit(quantize_dino_linears)(params)
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        rng.standard_normal((BS, IMG, IMG, 3)).astype(np.float32), dtype=dtype
    )
    print(f"backend={jax.default_backend()} bs={BS} img={IMG}")

    results = {}
    # interleave the variants twice to expose drift within the process
    for rnd in range(2):
        for name, unfused in (("fused", ""), ("unfused", "1")):
            os.environ["UCOD_INT8_UNFUSED_OUTPROJ"] = unfused
            jax.clear_caches()
            loop = build(cfg, params, qparams, dtype)
            float(loop(px, 1))
            t = marginal(lambda n: float(loop(px, n)))
            results.setdefault(name, []).append(t)
            print(f"round{rnd} {name:8s} {t*1e3:7.2f} ms/batch "
                  f"{BS/t:7.1f} img/s")
    os.environ.pop("UCOD_INT8_UNFUSED_OUTPROJ", None)
    tf, tu = min(results["fused"]), min(results["unfused"])
    print(f"best fused {BS/tf:.1f} img/s vs unfused {BS/tu:.1f} img/s "
          f"({tu/tf:.3f}x)")


if __name__ == "__main__":
    main()
