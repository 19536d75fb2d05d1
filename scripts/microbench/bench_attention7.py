"""Attention kernel round 4: removing the row-max softmax passes.

Softmax is shift-invariant: exp2(s - C)/sum(exp2(s - C)) is EXACT for any
constant C — the row max is only needed to keep exp2 in range.  For this
model family the scaled logits are bounded far inside f32's exp2 range, so a
constant shift folded into the (already present) additive mask row removes
TWO full-(bq,lp)-tile VPU passes (max-reduce, subtract) per head.

Guard band with C=30 (log2 units): overflow needs a scaled logit > 157
(natural-log equivalent 109); a denominator underflowing to zero needs ALL
of a row's logits below the p-dtype's subnormal floor — -119 log2 (natural
-83) for variant B's f32 probabilities, -103 log2 (natural -71) for the
ADOPTED variant C's bf16 probabilities (the binding bound; see
ops/attention.py).  DINOv2-B logit magnitudes are ~30 at the extreme
(outlier tokens) — both bounds have >2x margin, and breach produces a loud
Inf/NaN, not a silent wrong answer.

Variants:
  A. control: adopted round-3 kernel (mask row + exp2(s - rowmax));
  B. no-max: mask row carries the constant shift (0 -> -C, -inf stays);
  C. B + p in bf16: exp2 output directly in bf16 — also removes the
     f32->bf16 cast pass before the PV matmul (denominator summed in f32).
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
SHIFT = 30.0


def _kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, head_dim, variant):
    mask_row = None
    outs = []
    qscale = scale * LOG2E
    for h in range(2):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0][:, sl].astype(jnp.float32) * qscale).astype(q_ref.dtype)
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask_row is None:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
            valid = 0.0 if variant == "A" else -SHIFT
            mask_row = jnp.where(cols < seq_len, valid, -jnp.inf).astype(jnp.float32)
        s = s + mask_row
        if variant == "A":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
        elif variant == "B":
            p = jnp.exp2(s)
        else:  # C
            p = jnp.exp2(s).astype(v_ref.dtype)
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "variant"))
def packed(q, k, v, num_heads, scale, variant):
    b, seq_len, d_model = q.shape
    hd = d_model // num_heads
    lp = _ceil_to(seq_len, 128)
    block_q = _pick_q_block(lp)
    grid = (b, num_heads // 2, lp // block_q)
    return pl.pallas_call(
        functools.partial(_kernel, seq_len=seq_len, scale=scale, head_dim=hd, variant=variant),
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
    print(f"{name:40s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    b, L, d, nh = 16, 1370, 768, 12
    scale = 1.0 / np.sqrt(d // nh)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, L, d), jnp.bfloat16)
    kx = jax.random.normal(kk, (b, L, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, L, d), jnp.bfloat16)

    ref = multi_head_attention(q, kx, v, nh, scale=scale)
    for variant in ("A", "B", "C"):
        out = packed(q, kx, v, nh, float(scale), variant)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        timeit(f"{variant}", lambda qq, vv=variant: packed(qq, kx, v, nh, float(scale), vv), q)
        print(f"   max|.-ref| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
