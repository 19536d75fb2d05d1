"""LN+QKV fused Pallas kernel vs XLA (bs16 @ 518px), sum-forced timing."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ucod_dpl_tpu.models.dino import _dense, _layernorm

B, L, D = 16, 1370, 768
dt = jnp.bfloat16


def timeit(name, fn, *args, iters=32):
    @jax.jit
    def many(n, *a):
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = jax.tree.map(lambda t: t + eps.astype(t.dtype), a[-1])
            out = fn(*a[:-1], last)
            # full-output sum: prevents XLA slicing the computation down to
            # the one consumed element
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(many(1, *args))
    t0 = time.perf_counter(); float(many(1, *args)); one = time.perf_counter() - t0
    t0 = time.perf_counter(); float(many(iters + 1, *args)); dt_ = time.perf_counter() - t0 - one
    ms = dt_ / iters * 1000
    print(f"{name:45s} {ms:8.3f} ms", flush=True)
    return ms


params = {
    "ln_scale": jnp.ones((1, D), jnp.float32),
    "ln_bias": jnp.zeros((1, D), jnp.float32),
    "Wq": jax.random.normal(jax.random.PRNGKey(2), (D, D), jnp.float32) * 0.02,
    "Wk": jax.random.normal(jax.random.PRNGKey(3), (D, D), jnp.float32) * 0.02,
    "Wv": jax.random.normal(jax.random.PRNGKey(4), (D, D), jnp.float32) * 0.02,
    "bqkv": jnp.zeros((3, D), jnp.float32),
}
x = jax.random.normal(jax.random.PRNGKey(5), (B, L, D), dt)


def ref_lnqkv(p, x_):
    h = _layernorm(x_, {"scale": p["ln_scale"][0], "bias": p["ln_bias"][0]}, 1e-6)
    q = _dense(h, {"w": p["Wq"], "b": p["bqkv"][0]}, dt)
    k = _dense(h, {"w": p["Wk"], "b": p["bqkv"][1]}, dt)
    v = _dense(h, {"w": p["Wv"], "b": p["bqkv"][2]}, dt)
    return jnp.concatenate([q, k, v], -1)


def _kernel(x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, bias_ref, q_ref, k_ref, v_ref):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * s_ref[0] + b_ref[0]).astype(dt)
    for idx, (w_ref, o_ref) in enumerate(((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref))):
        o = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[0] = (o + bias_ref[idx]).astype(dt)


def make_fused(BQ):
    @jax.jit
    def fused(p, x_):
        b, l, d = x_.shape
        lp = ((l + BQ - 1) // BQ) * BQ
        grid = (b, lp // BQ)
        vec = pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((d, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BQ, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
                vec, vec, mat, mat, mat,
                pl.BlockSpec((3, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, BQ, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((b, l, d), dt)] * 3,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        )(x_, p["ln_scale"], p["ln_bias"], p["Wq"].astype(dt), p["Wk"].astype(dt),
          p["Wv"].astype(dt), p["bqkv"], )
        return jnp.concatenate(outs, -1)

    return fused


timeit("ln+qkv XLA", ref_lnqkv, params, x)
for bq in (256, 512, 704):
    timeit(f"ln+qkv fused (BQ={bq})", make_fused(bq), params, x)
a = ref_lnqkv(params, x).astype(jnp.float32)
b_ = make_fused(512)(params, x).astype(jnp.float32)
print("err:", float(jnp.max(jnp.abs(a - b_))))
