import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts/microbench")
import jax, jax.numpy as jnp, numpy as np
from ucod_dpl_tpu.models.dino import _dense

B, IMG, P, D = 16, 518, 14, 768
G = IMG // P
dt = jnp.bfloat16
kern = jax.random.normal(jax.random.PRNGKey(0), (P, P, 3, D), jnp.float32) * 0.02
bias = jnp.zeros((D,), jnp.float32)
pixels = jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 3), jnp.float32)

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
    print(f"{name:40s} {d_/iters*1000:8.3f} ms", flush=True)

def conv(k_, px):
    y = jax.lax.conv_general_dilated(px.astype(dt), k_.astype(dt), (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32).astype(dt)
    return y.reshape(B, G*G, D) + bias.astype(dt)

def matmul(k_, px):
    x = px.astype(dt).reshape(B, G, P, G, P, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, G*G, P*P*3)
    return _dense(x, {"w": k_.astype(dt).reshape(P*P*3, D), "b": bias}, dt)

def einsum6(k_, px):
    x6 = px.astype(dt).reshape(B, G, P, G, P, 3)
    y = jnp.einsum("bipjqc,pqcd->bijd", x6, k_.astype(dt))
    return y.reshape(B, G*G, D) + bias.astype(dt)

def rowsplit(k_, px):
    # contract width-within-patch+channel first per pixel-row: (B,518,37,42)@(42-> per p?) two-stage:
    x = px.astype(dt).reshape(B, IMG, G, P * 3)              # rows x patch-cols x (q,c)
    k2 = k_.astype(dt).reshape(P, P * 3, D)                  # (p, q*c, d)
    y = jnp.einsum("brgk,pkd->brgpd", x, k2)                 # (B,518,37,14,D) -- too big? 16*518*37*14*768
    return y  # just to measure stage cost
timeit("conv", conv, kern, pixels)
timeit("matmul+transpose", matmul, kern, pixels)
timeit("einsum 6d", einsum6, kern, pixels)
a = conv(kern, pixels).astype(jnp.float32); b = einsum6(kern, pixels).astype(jnp.float32)
print("einsum vs conv err:", float(jnp.max(jnp.abs(a-b))))

import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _patch_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]  # (518, 1554) f32
    x = x.reshape(37, 14, 37, 42).transpose(0, 2, 1, 3).reshape(1369, 588).astype(dt)
    y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (y + b_ref[0]).astype(dt)

@jax.jit
def pallas_patch(k_, px):
    xm = px.reshape(B, IMG, IMG * 3)
    w = k_.astype(dt).reshape(P * P * 3, D)
    b2 = bias.reshape(1, D)
    out = pl.pallas_call(
        _patch_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, IMG, IMG * 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * P * 3, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * G, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G * G, D), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(xm, w, b2)
    return out

try:
    timeit("pallas patch (whole img/program)", pallas_patch, kern, pixels)
    a = conv(kern, pixels).astype(jnp.float32); b = pallas_patch(kern, pixels).astype(jnp.float32)
    print("pallas vs conv err:", float(jnp.max(jnp.abs(a-b))))
except Exception as e:
    print("pallas patch failed:", str(e)[:300])

def _patch_kernel2(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]  # (518, 1554) f32
    cols = []
    for j in range(G):
        xj = x[:, j * 42 : (j + 1) * 42]           # (518, 42)
        cols.append(xj.reshape(G, P * 3 * P // 1))  # (37, 588): contiguous rows
    xall = jnp.concatenate(cols, axis=0).astype(dt)  # (1369, 588), j-major
    y = jnp.dot(xall, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (y + b_ref[0]).astype(dt)

@jax.jit
def pallas_patch2(k_, px):
    xm = px.reshape(B, IMG, IMG * 3)
    w = k_.astype(dt).reshape(P * P * 3, D)
    b2 = bias.reshape(1, D)
    out = pl.pallas_call(
        _patch_kernel2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, IMG, IMG * 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P * P * 3, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * G, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G * G, D), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(xm, w, b2)
    # kernel emits patches j-major; flip to row-major (i, j)
    return out.reshape(B, G, G, D).transpose(0, 2, 1, 3).reshape(B, G * G, D)

try:
    timeit("pallas patch v2 (slice+concat)", pallas_patch2, kern, pixels)
    a = conv(kern, pixels).astype(jnp.float32); b = pallas_patch2(kern, pixels).astype(jnp.float32)
    print("pallas2 vs conv err:", float(jnp.max(jnp.abs(a-b))))
except Exception as e:
    print("pallas patch2 failed:", str(e)[:200])
