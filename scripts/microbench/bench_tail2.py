"""Size the post-backbone tail of the folded live eval path at bs32:
(a) backbone+fold only, (b) + decoder body @68, (c) + 518 upsample/threshold.
Also A/B the threshold form: sigmoid(up)>0.5 vs the identical up>0."""

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
B, IMG, ITERS = 32, 518, 8


def fe_only(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    return jnp.sum(out["folded_features"].astype(jnp.float32))


def with_body(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    fg, _, _ = rev_decoder_forward_decoupled(dec, out["folded_features"], 68)
    return jnp.sum(fg)


def full_sigmoid(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    fg, _, _ = rev_decoder_forward_decoupled(dec, out["folded_features"], 68)
    up = interpolate_bilinear_nhwc(fg, (IMG, IMG))[..., 0]
    return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))


def full_gt0(bb, dec, pixels):
    fold = key_decoupling_fold(bb["layers"][-1]["k"]["w"], bb["layers"][-1]["k"]["b"], dec)
    out = dino_forward(bb, pixels, cfg, compute_dtype=dtype, key_fold=fold)
    fg, _, _ = rev_decoder_forward_decoupled(dec, out["folded_features"], 68)
    up = interpolate_bilinear_nhwc(fg, (IMG, IMG))[..., 0]
    return jnp.sum((up > 0).astype(jnp.int32))


def timed(body):
    @jax.jit
    def many(bb, dec, pixels, n):
        def step(i, acc):
            return acc + body(bb, dec, pixels + (acc % 3).astype(pixels.dtype) * 1e-6)

        return jax.lax.fori_loop(0, n, step, body(bb, dec, pixels) * 0)

    px = jnp.asarray(np.random.default_rng(0).standard_normal((B, IMG, IMG, 3)).astype(np.float32))
    float(many(backbone, decoder, px, 1))
    b1 = bm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(backbone, decoder, px, 1))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(many(backbone, decoder, px, ITERS + 1))
        bm = min(bm, time.perf_counter() - t0)
    dt = max(bm - b1, 1e-9)
    return dt / ITERS * 1000  # ms per batch


# each variant compiles the full backbone (~1-2 min over the remote-compile
# tunnel) — select via argv to stay within one run's timeout
which = sys.argv[1] if len(sys.argv) > 1 else "all"
variants = {
    "fe": ("backbone+fold", fe_only),
    "body": ("+decoder body @68", with_body),
    "sigmoid": ("+518 sigmoid>0.5", full_sigmoid),
    "gt0": ("+518 up>0 (same)", full_gt0),
}
for name, (label, fn) in variants.items():
    if which not in ("all", name):
        continue
    t = timed(fn)
    print(f"{label:20s}: {t:7.2f} ms/batch  ({B/t*1000:6.1f} img/s)")
