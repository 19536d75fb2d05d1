"""Attention round 3: external reference points (jax flash kernel, XLA
einsum) + v3 with pad-1408 + larger batch."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_attention2 import make_v3, timeit
from ucod_dpl_tpu.ops.attention import _pallas_attention_packed

B, L, NH, HD = 16, 1370, 12, 64
D = NH * HD
SCALE = 1.0 / np.sqrt(HD)


def jax_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    b, seq_len, d_model = q.shape

    def split(x):
        return x.reshape(b, seq_len, NH, HD).transpose(0, 2, 1, 3)

    o = flash_attention(split(q), split(k), split(v), causal=False, sm_scale=SCALE)
    return o.transpose(0, 2, 1, 3).reshape(b, seq_len, d_model)


def xla_attn(q, k, v):
    b, seq_len, d_model = q.shape

    def split(x):
        return x.reshape(b, seq_len, NH, HD).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32).astype(q.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, seq_len, d_model)


def xla_qk_only(q, k, v):
    b, seq_len, d_model = q.shape

    def split(x):
        return x.reshape(b, seq_len, NH, HD).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k), preferred_element_type=jnp.float32)
    return s.astype(q.dtype)


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, D), jnp.bfloat16)

    timeit("current packed", lambda a, b_, c: _pallas_attention_packed(a, b_, c, NH, SCALE), q, kk, v)
    timeit("v3 joint-store (block_q=256)", make_v3(256), q, kk, v)
    timeit("v3 joint-store (block_q=256, lp=1408)", make_v3(256, 1408), q, kk, v)
    try:
        timeit("jax flash_attention reference", jax_flash, q, kk, v)
    except Exception as e:
        print(f"jax flash_attention failed: {type(e).__name__}: {str(e)[:300]}")
    timeit("pure-XLA attention (full)", xla_attn, q, kk, v, iters=8)
    timeit("pure-XLA qk^T einsum only", xla_qk_only, q, kk, v, iters=8)

    q32 = jax.random.normal(jax.random.PRNGKey(3), (32, L, D), jnp.bfloat16)
    k32 = jax.random.normal(jax.random.PRNGKey(4), (32, L, D), jnp.bfloat16)
    v32 = jax.random.normal(jax.random.PRNGKey(5), (32, L, D), jnp.bfloat16)
    ms = timeit("v3 (block_q=256) at bs=32", make_v3(256), q32, k32, v32, iters=16)
    print(f"  per-16-img equivalent: {ms/2:.3f} ms")


if __name__ == "__main__":
    main()
