"""Attention + out-projection + layerscale + residual in ONE kernel.

NEGATIVE RESULT (kept as the measurement record): the accumulate-over-head-
pairs design (grid (b, i, h), h sequential, W_out sliced per pair, f32
scratch accumulator) cannot fit v5e's 16MB scoped VMEM at useful q-block
sizes — resident K/V double-buffers + the f32 score tile + the (bq, D)
accumulator + x/out blocks exceed the budget even at bq=176 (18.2MB).  The
estimated win over the XLA-composed out-proj epilogue was only ~0.1ms/layer;
not worth squeezing.  The production kernel keeps out-proj in XLA.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucod_dpl_tpu.models.dino import _dense
from ucod_dpl_tpu.ops.attention import _ceil_to, _pallas_attention_packed, _pick_q_block

B, L, NH, HD = 16, 1370, 12, 64
D = NH * HD
SCALE = 1.0 / np.sqrt(HD)
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
    print(f"{name:50s} {d_/iters*1000:8.3f} ms", flush=True)


def _kernel(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, ls_ref, o_ref, acc_ref, *, seq_len, scale, head_dim):
    h_idx = pl.program_id(2)
    n_h = pl.num_programs(2)
    col = None
    outs = []
    for hh in range(2):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if col is None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)
    o_pair = jnp.concatenate(outs, axis=-1).astype(dt)  # (bq, 128)
    contrib = jnp.dot(o_pair, wo_ref[...], preferred_element_type=jnp.float32)  # (bq, D) f32

    @pl.when(h_idx == 0)
    def _():
        acc_ref[...] = contrib

    @pl.when(h_idx > 0)
    def _():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(h_idx == n_h - 1)
    def _():
        full = acc_ref[...] + bo_ref[0]
        o_ref[0] = (x_ref[0].astype(jnp.float32) + full * ls_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("budget",))
def fused(params, q, k, v, x, budget=4 * 1024 * 1024):
    wo, bo, ls = params
    b, seq_len, d_model = q.shape
    hd = HD
    lp = _ceil_to(seq_len, 128)
    block_q = _pick_q_block(lp, budget)
    grid = (b, lp // block_q, NH // 2)
    out = pl.pallas_call(
        functools.partial(_kernel, seq_len=seq_len, scale=SCALE, head_dim=hd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * hd), lambda bb, i, h: (bb, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, 2 * hd), lambda bb, i, h: (bb, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, 2 * hd), lambda bb, i, h: (bb, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_model), lambda bb, i, h: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hd, d_model), lambda bb, i, h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_model), lambda bb, i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_model), lambda bb, i, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_model), lambda bb, i, h: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, seq_len, d_model), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_model), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, x, wo.astype(dt), bo, ls)
    return out


def ref(params, q, k, v, x):
    wo, bo, ls = params
    attn = _pallas_attention_packed(q, k, v, NH, SCALE)
    out = _dense(attn, {"w": wo, "b": bo[0]}, dt)
    return x + out * ls[0].astype(dt)


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), dt)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, L, D), dt)
    wo = jax.random.normal(jax.random.PRNGKey(4), (D, D), jnp.float32) * 0.02
    bo = jnp.zeros((1, D), jnp.float32)
    ls = jnp.ones((1, D), jnp.float32) * 0.9
    params = (wo, bo, ls)

    timeit("attn + outproj + ls + residual (XLA compose)", ref, params, q, k, v, x)
    for budget in (1, 2):
        timeit(f"fused attn+outproj kernel ({budget}MB s-tile)",
               functools.partial(fused, budget=budget * 1024 * 1024), params, q, k, v, x)
    a = ref(params, q, k, v, x).astype(jnp.float32)
    b_ = fused(params, q, k, v, x, budget=4 * 1024 * 1024).astype(jnp.float32)
    print("err:", float(jnp.max(jnp.abs(a - b_))))


if __name__ == "__main__":
    main()
