"""A/B: live eval path with vs without the key-projection/decoupling fold.

Baseline = round-3 bench.py composition: full dino_forward -> f32 key map ->
rev_decoder_forward_resized (f32 HIGHEST decoupling) -> upsample/threshold.
Variant  = dino_forward(key_fold=Wk@Wd) -> rev_decoder_forward_decoupled.

Methodology: marginal cost inside one jit (see microbench/README.md).
"""

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
    rev_decoder_forward_resized,
)
from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc

cfg = DinoConfig.dinov2_base()
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
backbone = init_dino(k1, cfg)
decoder = init_rev_decoder(k2, cfg.hidden_size)
B, IMG = (32, 518) if jax.default_backend() == "tpu" else (2, 70)
ITERS = 8 if jax.default_backend() == "tpu" else 2


def body_base(bb, dec, pixels):
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype)
    feats = out["key_features"].astype(jnp.float32)
    fg, _, _ = rev_decoder_forward_resized(dec, feats, 68)
    up = interpolate_bilinear_nhwc(fg, (IMG, IMG))[..., 0]
    return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))


def body_fold(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    fg, _, _ = rev_decoder_forward_decoupled(dec, out["folded_features"], 68)
    up = interpolate_bilinear_nhwc(fg, (IMG, IMG))[..., 0]
    return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))


def timed(body):
    @jax.jit
    def many(bb, dec, pixels, n):
        def step(i, acc):
            return acc + body(bb, dec, pixels + (acc % 3).astype(pixels.dtype) * 1e-6)

        return jax.lax.fori_loop(0, n, step, jnp.int32(0))

    px = jnp.asarray(np.random.default_rng(0).standard_normal((B, IMG, IMG, 3)).astype(np.float32))
    int(many(backbone, decoder, px, 1))
    b1 = bm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(many(backbone, decoder, px, 1))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(many(backbone, decoder, px, ITERS + 1))
        bm = min(bm, time.perf_counter() - t0)
    dt = max(bm - b1, 1e-9)
    return B * ITERS / dt


# numerical sanity: same masks
pxs = jnp.asarray(np.random.default_rng(1).standard_normal((2, IMG, IMG, 3)).astype(np.float32))
a = int(jax.jit(body_base)(backbone, decoder, pxs))
b = int(jax.jit(body_fold)(backbone, decoder, pxs))
print(f"mask-pixel checksum base={a} fold={b} (bf16-level agreement expected)")

print(f"baseline : {timed(body_base):8.1f} img/s")
print(f"key-fold : {timed(body_fold):8.1f} img/s")
