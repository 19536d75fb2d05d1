"""Microbenchmark the ViT hot path, component by component, on the real TPU.

Timing methodology matches bench.py: fori_loop inside jit with a scalar
readback, marginal cost of extra iterations (axon tunnel RTT excluded).
Params are passed as jit arguments (closure constants blow the remote-compile
request limit on tunneled chips).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino, _dense, _layernorm
from ucod_dpl_tpu.ops.attention import multi_head_attention


def timeit(name, fn, *args, iters=32):
    """fn(*args) -> array; all array operands must be in args (no closures
    over big pytrees). Returns per-iter ms."""

    @jax.jit
    def many(n, *a):
        # the LAST arg (activation input) is perturbed with the running
        # accumulator so XLA cannot hoist fn out of the loop; params stay
        # loop-invariant (realistic: resident weights).
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = jax.tree.map(
                lambda t: t + eps.astype(t.dtype)
                if jnp.issubdtype(t.dtype, jnp.floating)
                else t,
                a[-1],
            )
            out = fn(*a[:-1], last)
            return acc + out.astype(jnp.float32).ravel()[0] * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(many(1, *args))
    t0 = time.perf_counter()
    float(many(1, *args))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(iters + 1, *args))
    dt = time.perf_counter() - t0 - one
    ms = dt / iters * 1000
    print(f"{name:50s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    cfg = DinoConfig.dinov2_base()
    dtype = jnp.bfloat16
    b, img = 16, 518
    L = (img // 14) ** 2 + 1  # 1370
    d = cfg.hidden_size

    k = jax.random.PRNGKey(0)
    params = init_dino(k, cfg)
    layer = params["layers"][0]

    pixels = jax.random.normal(k, (b, img, img, 3), jnp.float32)
    x = jax.random.normal(k, (b, L, d), dtype)

    print(f"batch={b} L={L} d={d} dtype={dtype.__name__}", flush=True)

    scale = 1.0 / np.sqrt(cfg.head_dim)

    timeit("null (perturb-only overhead, x)", lambda xx: xx, x)

    # full forward
    def full(p, px):
        return dino_forward(p, px, cfg, compute_dtype=dtype)["key_features"]

    full_ms = timeit("full dino_forward", full, params, pixels, iters=8)
    print(f"  => {b / (full_ms / 1000):.1f} img/s implied (forward only)", flush=True)

    def one_layer(ly, xx):
        h = _layernorm(xx, ly["norm1"], cfg.layer_norm_eps)
        q = _dense(h, ly["q"], dtype)
        kk = _dense(h, ly["k"], dtype)
        v = _dense(h, ly["v"], dtype)
        attn = multi_head_attention(q, kk, v, cfg.num_heads, scale=scale)
        attn = _dense(attn, ly["out"], dtype)
        attn = attn * ly["ls1"].astype(dtype)
        xx = xx + attn
        h2 = _layernorm(xx, ly["norm2"], cfg.layer_norm_eps)
        h2 = _dense(h2, ly["fc1"], dtype)
        h2 = jax.nn.gelu(h2, approximate=True)
        h2 = _dense(h2, ly["fc2"], dtype)
        h2 = h2 * ly["ls2"].astype(dtype)
        return xx + h2

    timeit("one composed layer", one_layer, layer, x)

    timeit("layernorm", lambda ly, xx: _layernorm(xx, ly["norm1"], cfg.layer_norm_eps), layer, x)
    timeit("dense 768x768", lambda ly, xx: _dense(xx, ly["q"], dtype), layer, x)
    timeit("dense 768x3072 (fc1)", lambda ly, xx: _dense(xx, ly["fc1"], dtype), layer, x)
    h4 = jax.random.normal(k, (b, L, 4 * d), dtype)
    timeit("dense 3072x768 (fc2)", lambda ly, xx: _dense(xx, ly["fc2"], dtype), layer, h4)
    timeit("gelu on 4d", lambda xx: jax.nn.gelu(xx, approximate=True), h4)

    q = jax.random.normal(k, (b, L, d), dtype)
    timeit(
        "attention (packed pallas)",
        lambda qq: multi_head_attention(qq, qq, qq, cfg.num_heads, scale=scale),
        q,
    )

    def attn_half(ly, xx):
        h = _layernorm(xx, ly["norm1"], cfg.layer_norm_eps)
        qq = _dense(h, ly["q"], dtype)
        kk = _dense(h, ly["k"], dtype)
        vv = _dense(h, ly["v"], dtype)
        attn = multi_head_attention(qq, kk, vv, cfg.num_heads, scale=scale)
        attn = _dense(attn, ly["out"], dtype)
        return xx + attn * ly["ls1"].astype(dtype)

    def mlp_half(ly, xx):
        h2 = _layernorm(xx, ly["norm2"], cfg.layer_norm_eps)
        h2 = _dense(h2, ly["fc1"], dtype)
        h2 = jax.nn.gelu(h2, approximate=True)
        h2 = _dense(h2, ly["fc2"], dtype)
        return xx + h2 * ly["ls2"].astype(dtype)

    timeit("attention half (ln+qkv+attn+out+res)", attn_half, layer, x)
    timeit("mlp half (ln+fc1+gelu+fc2+res)", mlp_half, layer, x)

    def patch_embed(p, px):
        return jax.lax.conv_general_dilated(
            px.astype(dtype),
            p["patch_embed"]["kernel"].astype(dtype),
            window_strides=(14, 14),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    timeit("patch embed conv", patch_embed, params, pixels)

    flops_layer = b * (4 * L * d * d + 2 * L * d * 4 * d) * 2 + 4 * b * L * L * d
    print(f"\nper-layer FLOPs: {flops_layer/1e9:.1f} GF; at 197 TF/s peak = {flops_layer/197e12*1000:.3f} ms")
    flops_full = 12 * flops_layer + b * L * 14 * 14 * 3 * d * 2
    print(f"full fwd FLOPs: {flops_full/1e9:.1f} GF; at peak = {flops_full/197e12*1000:.2f} ms => {b/(flops_full/197e12):.0f} img/s")


if __name__ == "__main__":
    main()
