"""Patch-embed round 3: formulations not covered by bench_patch_embed.py.

The 14x14/s14 conv on (16,518,518,3) measures ~0.95ms vs a ~0.2ms roofline
(19.8 GFLOP).  Previously measured: NHWC conv (adopted), reshape+matmul and
6-D einsum (1.05-1.24ms, transpose-dominated), Pallas (Mosaic rejects the
relayout).  New here:

  A. baseline NHWC conv (control);
  B. free reshape (518*3 -> 37*42 on the contiguous tail) to (b,518,37,42),
     then a (14,1)-kernel conv with 42 input channels: the im2col contraction
     becomes 14*42=588 with NO host-visible transpose;
  C. same reshape, then conv expressed as NCHW;
  D. B but bf16 input pre-cast outside the timed region (isolate cast cost).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=64):
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
    b, img, p, d = 16, 518, 14, 768
    g = img // p  # 37
    dtype = jnp.bfloat16

    k = jax.random.PRNGKey(0)
    pixels = jax.random.normal(k, (b, img, img, 3), jnp.float32)
    kern = jax.random.normal(k, (p, p, 3, d), jnp.float32)  # HWIO

    def conv_nhwc(kk, px):
        return jax.lax.conv_general_dilated(
            px.astype(dtype), kk.astype(dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    a_ms = timeit("A: NHWC conv 14x14 s14 (baseline)", conv_nhwc, kern, pixels)

    # B: (b,518,518,3) -> (b,518,37,42) is a pure view (518*3 == 37*42 on the
    # contiguous tail, grouping 14 w-pixels x 3 channels per lane-block);
    # kernel (14,14,3,768) -> (14,1,42,768) matches that (kw, c) lane order.
    kern_b = kern.reshape(p, 1, p * 3, d)

    def conv_1d(kk, px):
        x = px.reshape(b, img, g, p * 3)
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kk.astype(dtype), (p, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    b_ms = timeit("B: free-reshape + (14,1) conv, 42 in-ch", conv_1d, kern_b, pixels)

    # numeric check B vs A
    ya = conv_nhwc(kern, pixels)
    yb = conv_1d(kern_b, pixels)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    print(f"   max|A-B| = {err:.3e}", flush=True)

    # C: same reshape, NCHW numbers
    kern_c = jnp.transpose(kern_b, (3, 2, 0, 1))  # HWIO -> OIHW

    def conv_1d_nchw(kk, px):
        x = px.reshape(b, img, g, p * 3).transpose(0, 3, 1, 2)
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kk.astype(dtype), (p, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    timeit("C: free-reshape + (14,1) conv, NCHW", conv_1d_nchw, kern_c, pixels)

    # D: isolate the f32->bf16 input cast cost from B
    pixels_bf = pixels.astype(dtype)
    kern_b_bf = kern_b.astype(dtype)

    def conv_1d_precast(kk, px):
        x = px.reshape(b, img, g, p * 3)
        return jax.lax.conv_general_dilated(
            x, kk, (p, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    timeit("D: B with pre-cast bf16 input", conv_1d_precast, kern_b_bf, pixels_bf)

    print(f"\nB vs A: {a_ms - b_ms:+.3f} ms per call", flush=True)


if __name__ == "__main__":
    main()
