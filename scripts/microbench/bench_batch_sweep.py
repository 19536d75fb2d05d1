"""Batch-size sweep of the full eval body (dino fwd + decoder + upsample).

Checks whether bs>16 amortises fixed per-program overheads enough to lift
img/s at 518px (bench.py uses bs16). Timing methodology = bench.py (marginal
cost of extra fori_loop iterations, scalar readback).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.models.dba import init_rev_decoder, rev_decoder_forward_resized
from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc


def main():
    cfg = DinoConfig.dinov2_base()
    dtype = jnp.bfloat16
    img = 518

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)

    def eval_body(bp, dp, pixels):
        out = dino_forward(bp, pixels, cfg, compute_dtype=dtype)
        feats = out["key_features"].astype(jnp.float32)
        fg, _, _ = rev_decoder_forward_resized(dp, feats, 68)
        up = interpolate_bilinear_nhwc(fg, (img, img))[..., 0]
        return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))

    @jax.jit
    def eval_many(bp, dp, pixels, n):
        def body(i, acc):
            return acc + eval_body(bp, dp, pixels + (acc % 3).astype(pixels.dtype) * 1e-6)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    for batch in (8, 16, 24, 32, 48):
        pixels = jnp.asarray(rng.standard_normal((batch, img, img, 3)).astype(np.float32))
        iters = max(4, 256 // batch)
        int(eval_many(backbone, decoder, pixels, 1))
        best_one = best_many = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(eval_many(backbone, decoder, pixels, 1))
            best_one = min(best_one, time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(eval_many(backbone, decoder, pixels, iters + 1))
            best_many = min(best_many, time.perf_counter() - t0)
        dt = max(best_many - best_one, 1e-9)
        rate = batch * iters / dt
        print(f"bs={batch:3d} iters={iters:3d}  {dt/iters*1000:8.2f} ms/batch  {rate:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
