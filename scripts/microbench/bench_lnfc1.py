"""ln2 + fc1 + gelu fused kernel (fc2 stays XLA)."""
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
}
x = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), dt)


def ref(pp, x_):
    h = _layernorm(x_, {"scale": pp["s"][0], "bias": pp["b"][0]}, 1e-6)
    h = _dense(h, {"w": pp["W1"], "b": pp["b1"][0]}, dt)
    return jax.nn.gelu(h, approximate=True)


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * s_ref[0] + b_ref[0]).astype(dt)
    h1 = (jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0]).astype(dt)
    o_ref[0] = jax.nn.gelu(h1, approximate=True)


def make_fused(BQ):
    @jax.jit
    def fused(pp, x_):
        b, l, d = x_.shape
        lp = ((l + BQ - 1) // BQ) * BQ
        grid = (b, lp // BQ)
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BQ, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, DF), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DF), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, DF), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, l, DF), dt),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        )(x_, pp["s"], pp["b"], pp["W1"].astype(dt), pp["b1"])
        return out
    return fused


timeit("ln2+fc1+gelu XLA", ref, p, x)
for bq in (256, 512, 704):
    timeit(f"ln2+fc1+gelu fused (BQ={bq})", make_fused(bq), p, x)
a = ref(p, x).astype(jnp.float32)
b_ = make_fused(512)(p, x).astype(jnp.float32)
print("err:", float(jnp.max(jnp.abs(a - b_))))
