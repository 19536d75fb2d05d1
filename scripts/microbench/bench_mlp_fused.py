"""Whole MLP-half fused kernel: ln2 + fc1 + gelu + fc2 + ls2 + residual."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ucod_dpl_tpu.models.dino import _dense, _layernorm

B, L, D, DF = 16, 1370, 768, 3072
dt = jnp.bfloat16


def timeit(name, fn, *args, iters=32):
    @jax.jit
    def many(n, *a):
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = jax.tree.map(lambda t: t + eps.astype(t.dtype), a[-1])
            out = fn(*a[:-1], last)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    float(many(1, *args))
    t0 = time.perf_counter(); float(many(1, *args)); one = time.perf_counter() - t0
    t0 = time.perf_counter(); float(many(iters + 1, *args)); d_ = time.perf_counter() - t0 - one
    print(f"{name:45s} {d_/iters*1000:8.3f} ms", flush=True)


p = {
    "s": jnp.ones((1, D), jnp.float32), "b": jnp.zeros((1, D), jnp.float32),
    "W1": jax.random.normal(jax.random.PRNGKey(0), (D, DF), jnp.float32) * 0.02,
    "b1": jnp.zeros((1, DF), jnp.float32),
    "W2": jax.random.normal(jax.random.PRNGKey(1), (DF, D), jnp.float32) * 0.02,
    "b2": jnp.zeros((1, D), jnp.float32),
    "ls2": jnp.ones((1, D), jnp.float32) * 0.9,
}
x = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), dt)


def ref_mlp(pp, x_):
    h2 = _layernorm(x_, {"scale": pp["s"][0], "bias": pp["b"][0]}, 1e-6)
    h2 = _dense(h2, {"w": pp["W1"], "b": pp["b1"][0]}, dt)
    h2 = jax.nn.gelu(h2, approximate=True)
    h2 = _dense(h2, {"w": pp["W2"], "b": pp["b2"][0]}, dt)
    return x_ + h2 * pp["ls2"][0].astype(dt)


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * s_ref[0] + b_ref[0]).astype(dt)
    h1 = (jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0]).astype(dt)
    h1 = jax.nn.gelu(h1, approximate=True)
    h2 = (jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[0]).astype(dt)
    o_ref[0] = x_ref[0] + h2 * ls_ref[0].astype(dt)


def make_fused(BQ):
    @jax.jit
    def fused(pp, x_):
        b, l, d = x_.shape
        lp = ((l + BQ - 1) // BQ) * BQ
        grid = (b, lp // BQ)
        blk = pl.BlockSpec((1, BQ, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM)
        vd = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
        vf = pl.BlockSpec((1, DF), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                blk, vd, vd,
                pl.BlockSpec((d, DF), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
                vf,
                pl.BlockSpec((DF, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
                vd, vd,
            ],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((b, l, d), dt),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        )(x_, pp["s"], pp["b"], pp["W1"].astype(dt), pp["b1"], pp["W2"].astype(dt), pp["b2"], pp["ls2"])
        return out
    return fused


timeit("mlp half XLA", ref_mlp, p, x)
for bq in (128, 256, 512):
    try:
        timeit(f"mlp half fused (BQ={bq})", make_fused(bq), p, x)
    except Exception as e:
        print(f"BQ={bq} failed: {str(e)[:150]}")
a = ref_mlp(p, x).astype(jnp.float32)
b_ = make_fused(256)(p, x).astype(jnp.float32)
print("err:", float(jnp.max(jnp.abs(a - b_))))
