"""Attention round 2: joint-head scheduling, 128-lane stores, in-kernel
q-loop, and jax's reference flash kernel."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucod_dpl_tpu.ops.attention import _pallas_attention_packed

B, L, NH, HD = 16, 1370, 12, 64
D = NH * HD
SCALE = 1.0 / np.sqrt(HD)


def timeit(name, fn, *args, iters=32):
    @jax.jit
    def many(n, *a):
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = jax.tree.map(lambda t: t + eps.astype(t.dtype), a[-1])
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
    print(f"{name:55s} {ms:8.3f} ms", flush=True)
    return ms


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


def _kernel_v3(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, head_dim):
    """Both heads computed jointly (independent chains for ILP), single
    128-lane store."""
    col = None
    outs = []
    for h in range(2):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
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
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def make_v3(block_q, lp_pad=None):
    def run(q, k, v):
        b, seq_len, d_model = q.shape
        hd = HD
        lp = lp_pad or _ceil_to(seq_len, block_q)
        pad = [(0, 0), (0, lp - seq_len), (0, 0)]
        qp = jnp.pad(q, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        grid = (b, NH // 2, lp // block_q)
        out = pl.pallas_call(
            functools.partial(_kernel_v3, seq_len=seq_len, scale=SCALE, head_dim=hd),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lp, d_model), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qp, kp, vp)
        return out[:, :seq_len, :]

    return run


def _kernel_v4(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, head_dim, block_q, n_blocks):
    """Whole q in VMEM; unrolled q-block loop inside the kernel body gives the
    scheduler 2*n_blocks independent chains."""
    k_all = k_ref[0]
    v_all = v_ref[0]
    for i in range(n_blocks):
        rows = slice(i * block_q, (i + 1) * block_q)
        col = None
        outs = []
        for h in range(2):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[0][rows, sl]
            s = jax.lax.dot_general(
                q, k_all[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_all.dtype), v_all[:, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            outs.append(o / denom)
        o_ref[0, rows, :] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def make_v4(block_q):
    def run(q, k, v):
        b, seq_len, d_model = q.shape
        hd = HD
        lp = _ceil_to(seq_len, block_q)
        pad = [(0, 0), (0, lp - seq_len), (0, 0)]
        qp = jnp.pad(q, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        grid = (b, NH // 2)
        out = pl.pallas_call(
            functools.partial(
                _kernel_v4, seq_len=seq_len, scale=SCALE, head_dim=hd,
                block_q=block_q, n_blocks=lp // block_q,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h: (bb, 0, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h: (bb, 0, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h: (bb, 0, h), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lp, 2 * hd), lambda bb, h: (bb, 0, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lp, d_model), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(qp, kp, vp)
        return out[:, :seq_len, :]

    return run


def jax_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    b, seq_len, d_model = q.shape

    def split(x):
        return x.reshape(b, seq_len, NH, HD).transpose(0, 2, 1, 3)

    o = flash_attention(split(q), split(k), split(v), causal=False, sm_scale=SCALE)
    return o.transpose(0, 2, 1, 3).reshape(b, seq_len, d_model)


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), jnp.bfloat16)

    timeit("current packed", lambda a, b_, c: _pallas_attention_packed(a, b_, c, NH, SCALE), q, kk, v)
    for bq in (256, 512):
        timeit(f"v3 joint-store (block_q={bq})", make_v3(bq), q, kk, v)
    timeit("v3 joint-store (block_q=128, lp=1408)", make_v3(128, 1408), q, kk, v)
    for bq in (256, 512):
        timeit(f"v4 in-kernel qloop (block_q={bq})", make_v4(bq), q, kk, v)
    try:
        timeit("jax flash_attention reference", jax_flash, q, kk, v)
    except Exception as e:
        print(f"jax flash_attention failed: {type(e).__name__}: {e}")

    ref = _pallas_attention_packed(q, kk, v, NH, SCALE)
    for name, fn in [("v3", make_v3(256)), ("v4", make_v4(256))]:
        got = fn(q, kk, v)
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        print(f"{name} vs current max abs err: {float(err):.2e}")


if __name__ == "__main__":
    main()
