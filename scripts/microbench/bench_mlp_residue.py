"""Hunt the ~0.25ms/layer MLP-half residue (bs16@518px).

profile_vit showed: composed mlp half 1.294ms vs ln 0.06 + fc1 0.430 +
fc2 0.553 = 1.04ms sum-of-parts.  Hypothesis: XLA does not fold gelu into
fc1's epilogue — the (21920, 3072) bf16 expansion (134MB) gets a separate
read+write pass.  Measures each composition plus the new fc1+gelu Pallas
kernel (ops/fused_layers.fc1_gelu) standalone and in the full mlp half.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.models.dino import DinoConfig, _dense, _layernorm, init_dino
from ucod_dpl_tpu.ops.fused_layers import fc1_gelu


def timeit(name, fn, *args, iters=32):
    @jax.jit
    def many(n, *a):
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
    best_one = best_many = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(1, *args))
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(many(iters + 1, *args))
        best_many = min(best_many, time.perf_counter() - t0)
    ms = max(best_many - best_one, 1e-9) / iters * 1000
    print(f"{name:58s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    cfg = DinoConfig.dinov2_base()
    dtype = jnp.bfloat16
    b, img = 16, 518
    L = (img // 14) ** 2 + 1
    d = cfg.hidden_size

    k = jax.random.PRNGKey(0)
    params = init_dino(k, cfg)
    layer = params["layers"][0]
    x = jax.random.normal(k, (b, L, d), dtype)

    timeit("fc1", lambda ly, xx: _dense(xx, ly["fc1"], dtype), layer, x)
    timeit(
        "gelu(fc1) XLA",
        lambda ly, xx: jax.nn.gelu(_dense(xx, ly["fc1"], dtype), approximate=True),
        layer,
        x,
    )
    timeit("fc1_gelu Pallas kernel", lambda ly, xx: fc1_gelu(xx, ly["fc1"]), layer, x)

    # numeric check
    ya = jax.nn.gelu(_dense(x, layer["fc1"], dtype), approximate=True)
    yb = fc1_gelu(x, layer["fc1"])
    print(
        f"   max|XLA-Pallas| = "
        f"{float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))):.3e}",
        flush=True,
    )

    def mlp_xla(ly, xx):
        h2 = _layernorm(xx, ly["norm2"], cfg.layer_norm_eps)
        h2 = _dense(h2, ly["fc1"], dtype)
        h2 = jax.nn.gelu(h2, approximate=True)
        h2 = _dense(h2, ly["fc2"], dtype)
        return xx + h2 * ly["ls2"].astype(dtype)

    def mlp_kernel(ly, xx):
        h2 = _layernorm(xx, ly["norm2"], cfg.layer_norm_eps)
        h2 = fc1_gelu(h2, ly["fc1"])
        h2 = _dense(h2, ly["fc2"], dtype)
        return xx + h2 * ly["ls2"].astype(dtype)

    timeit("mlp half XLA (control)", mlp_xla, layer, x)
    timeit("mlp half with fc1_gelu kernel", mlp_kernel, layer, x)

    # residual-side composition: does the out-proj epilogue fuse?
    attn = jax.random.normal(k, (b, L, d), dtype)

    def outproj_res(ly, aa):
        o = _dense(aa, ly["out"], dtype)
        return x + o * ly["ls1"].astype(dtype)

    timeit("out-proj + ls1 + residual", outproj_res, layer, attn)
    timeit("out-proj alone", lambda ly, aa: _dense(aa, ly["out"], dtype), layer, attn)


if __name__ == "__main__":
    main()
