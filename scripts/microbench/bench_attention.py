"""Attention-kernel variant shootout on the real TPU (bs16 @ 518px shapes).

Finds where the 1.9ms goes (roofline ~0.94ms at 50% MXU for head_dim 64)
and which softmax restructuring closes the gap.
"""

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


# --- variant kernels ---------------------------------------------------------

def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, head_dim, nomask):
    """Head-pair kernel, manual softmax with denominator folded into the
    output (divide on (bq, hd) instead of (bq, Lp))."""
    for h in range(2):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if not nomask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def _kernel_nosoftmax(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, head_dim):
    """MXU-only reference point: scores scaled, no exp/max/mask."""
    for h in range(2):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        o = jax.lax.dot_general(
            s.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def make_packed(kernel, block_q, pad_to, **kw):
    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v):
        b, seq_len, d_model = q.shape
        hd = HD
        lp = _ceil_to(max(seq_len, pad_to), block_q) if pad_to else _ceil_to(seq_len, block_q)
        pad = [(0, 0), (0, lp - seq_len), (0, 0)]
        qp = jnp.pad(q, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        grid = (b, NH // 2, lp // block_q)
        body = functools.partial(kernel, seq_len=seq_len, scale=SCALE, head_dim=hd, **kw)
        out = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lp, d_model), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * NH * lp * lp * hd,
                bytes_accessed=4 * b * lp * d_model * q.dtype.itemsize,
                transcendentals=b * NH * lp * lp,
            ),
        )(qp, kp, vp)
        return out[:, :seq_len, :]

    return run


def main():
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (B, L, D), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), jnp.bfloat16)

    flops = 4 * B * NH * L * L * HD
    print(f"attention FLOPs {flops/1e9:.1f} GF; roofline@197TF {flops/197e12*1e3:.3f} ms; @50%-MXU {flops/98.5e12*1e3:.3f} ms", flush=True)

    timeit("current packed (block_q=256, pad 1536)", lambda a, b_, c: _pallas_attention_packed(a, b_, c, NH, SCALE), q, kk, v)

    for bq in (128, 256, 512):
        timeit(f"v2 folddiv (block_q={bq})", make_packed(_kernel_v2, bq, 0, nomask=False), q, kk, v)
    # pad 1408 = 11*128: kernel sees less padded-column work
    timeit("v2 folddiv (block_q=128, pad 1408)", make_packed(_kernel_v2, 128, 1408, nomask=False), q, kk, v)
    timeit("v2 folddiv nomask (block_q=128)", make_packed(_kernel_v2, 128, 0, nomask=True), q, kk, v)
    timeit("nosoftmax MXU-only (block_q=256)", make_packed(_kernel_nosoftmax, 256, 0), q, kk, v)
    timeit("nosoftmax MXU-only (block_q=128)", make_packed(_kernel_nosoftmax, 128, 0), q, kk, v)

    # correctness of v2 vs current
    ref = _pallas_attention_packed(q, kk, v, NH, SCALE)
    got = make_packed(_kernel_v2, 128, 1408, nomask=False)(q, kk, v)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    print(f"v2 vs current max abs err: {float(err):.2e}")


if __name__ == "__main__":
    main()
