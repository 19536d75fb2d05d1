"""Attention kernel round 3: VPU-pass shaving on the f32 score tile.

Current packed head-pair kernel (ops/attention.py) spends, per head, these
full-(bq, lp)-tile VPU passes besides the two MXU matmuls: iota+compare+
select mask (the iota is shared by both heads), max-reduce, subtract, exp.
Variants:

  A. control: current kernel via multi_head_attention;
  B. additive mask row: a (1, lp) 0/-inf row broadcast-added into s
     (1 pass instead of compare+select's 2; iota only over one row);
  C. exp2: fold log2(e) into the q-scale, use exp2(s - m) — saves the
     hidden x*log2e multiply inside exp's lowering (if Mosaic lowers exp
     that way; measured here rather than assumed);
  D. B + C combined.

All variants are numerically checked against A (must match to bf16 output
tolerance; the max-subtracted softmax keeps the same stability).
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

from ucod_dpl_tpu.ops.attention import _ceil_to, _pick_q_block, multi_head_attention

LOG2E = float(np.log2(np.e))


def _kernel_variant(
    q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float, head_dim: int,
    additive_mask: bool, use_exp2: bool,
):
    mask_row = None
    col = None
    outs = []
    qscale = scale * (LOG2E if use_exp2 else 1.0)
    for h in range(2):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * qscale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if additive_mask:
            if mask_row is None:
                cols = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
                mask_row = jnp.where(cols < seq_len, 0.0, -jnp.inf).astype(jnp.float32)
            s = s + mask_row
        else:
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m) if use_exp2 else jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "additive_mask", "use_exp2")
)
def packed_variant(q, k, v, num_heads, scale, additive_mask, use_exp2):
    b, seq_len, d_model = q.shape
    hd = d_model // num_heads
    lp = _ceil_to(seq_len, 128)
    block_q = _pick_q_block(lp)
    grid = (b, num_heads // 2, lp // block_q)
    return pl.pallas_call(
        functools.partial(
            _kernel_variant, seq_len=seq_len, scale=scale, head_dim=hd,
            additive_mask=additive_mask, use_exp2=use_exp2,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, 2 * hd), lambda bb, h, i: (bb, 0, h), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 2 * hd), lambda bb, h, i: (bb, i, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, seq_len, d_model), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def timeit(name, fn, *args, iters=32):
    @jax.jit
    def many(n, *a):
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = a[-1] + eps.astype(a[-1].dtype)
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
    b, L, d, nh = 16, 1370, 768, 12
    scale = 1.0 / np.sqrt(d // nh)
    k = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (b, L, d), jnp.bfloat16)
    kx = jax.random.normal(kk, (b, L, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, L, d), jnp.bfloat16)

    ref = multi_head_attention(q, kx, v, nh, scale=scale)
    for name, am, e2 in (
        ("A control (current kernel)", False, False),
        ("B additive mask row", True, False),
        ("C exp2, log2e folded into q-scale", False, True),
        ("D additive mask + exp2", True, True),
    ):
        out = packed_variant(q, kx, v, nh, float(scale), am, e2)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        ms = timeit(name, lambda qq, am=am, e2=e2: packed_variant(qq, kx, v, nh, float(scale), am, e2), q)
        print(f"   max|.-ref| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
