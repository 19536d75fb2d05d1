"""Batch-size re-sweep of the folded live eval path (round-4: the key-fold
changed the per-batch tail cost, so round-3's bs32 optimum may have moved)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.models.dba import (
    init_rev_decoder,
    key_decoupling_fold,
    rev_decoder_forward_decoupled,
)
from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc

cfg = DinoConfig.dinov2_base()
dtype = jnp.bfloat16
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
backbone = init_dino(k1, cfg)
decoder = init_rev_decoder(k2, cfg.hidden_size)
IMG = 518


def body(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    fg, _, _ = rev_decoder_forward_decoupled(dec, out["folded_features"], 68)
    up = interpolate_bilinear_nhwc(fg, (IMG, IMG))[..., 0]
    return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))


@jax.jit
def many(bb, dec, pixels, n):
    def step(i, acc):
        return acc + body(bb, dec, pixels + (acc % 3).astype(pixels.dtype) * 1e-6)

    return jax.lax.fori_loop(0, n, step, jnp.int32(0))


for B in (24, 32, 40, 48):
    iters = max(1, 256 // B)
    px = jnp.asarray(np.random.default_rng(0).standard_normal((B, IMG, IMG, 3)).astype(np.float32))
    int(many(backbone, decoder, px, 1))
    b1 = bm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(many(backbone, decoder, px, 1))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(many(backbone, decoder, px, iters + 1))
        bm = min(bm, time.perf_counter() - t0)
    dt = max(bm - b1, 1e-9)
    print(f"bs{B:3d}: {B * iters / dt:8.1f} img/s")
