"""Patch embed, round-5 attempt: Pallas im2col matmul with fused pos-add.

OUTCOME (round 5): NEGATIVE — 0.43-0.45 ms stands as the measured floor.

Current adopted path (bench_patch_embed2): free (W,C)->(W/p, p*C) reshape +
(14,1)-kernel conv = 0.43 ms at bs16@518px (roofline ~0.2 ms).  This
attempt folded the 42-lane trick into a single Pallas matmul: grid (B,);
per program the (518, 1554) image slab reshapes in VMEM to the (1369, 588)
im2col tile — A[g*37+w, p*42+c] = x[g*14+p, w*42+c], a
(37,14,37,42)->(37,37,14,42) middle-dim transpose — then ONE
(1369,588)@(588,768) MXU matmul (+bias +pos +fused pos-embed).  M pads
1369->1408 (97%), K 588->640 (92%): ~0.15-0.2 ms if the relayout were free.

Mosaic REJECTS the in-kernel relayout:
    infer-vector-layout: unsupported shape cast
    tpu.reshape (vector<1x518x1554xbf16>) -> vector<37x14x37x42xbf16>
i.e. lane-granular (42-lane-group) shape casts are outside its layout
inference — the same wall the round-3 Pallas variants hit.  The structural
bind: the ONLY transpose-free data layout groups 42 lanes per patch-row
pixel, and that granularity is exactly what Mosaic cannot shape-cast; any
other route materialises the (14, gw)-transpose in XLA first, which was
measured to cancel the matmul's win (bench_patch_lnqkv.py: "a wash").
Host-side im2col (numpy strided copy, ~10 ms/batch of host time for ~0.3 ms
of device win) was considered and rejected: it loads the host (already the
e2e bottleneck on small hosts) to chase ~1% of device time.
Interpret-mode correctness of the kernel itself: maxdiff 2.6e-6 vs the
conv path (the math was right; the backend can't lay it out).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, IMG, P, C, D = 16, 518, 14, 3, 768
GW = IMG // P  # 37
L = GW * GW  # 1369
K = P * P * C  # 588


def conv_current(px, pe, bias, pos):
    """The adopted (14,1)-kernel conv path (models/dino.py)."""
    x = px.reshape(B, IMG, GW, P * C)
    k = pe.reshape(P, 1, P * C, D)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(P, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(px.dtype)
    y = y + bias.astype(px.dtype)
    y = y.reshape(B, L, D)
    return y + pos.astype(px.dtype)


def _kernel(x_ref, w_ref, b_ref, pos_ref, o_ref):
    # x block: (1, IMG, GW*P*C) = (1, 518, 1554)
    x = x_ref[0]  # (518, 1554)
    x = x.reshape(GW, P, GW, P * C)
    x = jnp.transpose(x, (0, 2, 1, 3))  # (37, 37, 14, 42) — the relayout
    a = x.reshape(L, K)
    y = jax.lax.dot_general(
        a, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (y + b_ref[...] + pos_ref[...]).astype(o_ref.dtype)


@jax.jit
def pallas_im2col(px, w_km, bias, pos):
    x = px.reshape(B, IMG, GW * P * C)
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, IMG, GW * P * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), px.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * K * D,
            bytes_accessed=B * IMG * GW * P * C * 2 + B * L * D * 2,
            transcendentals=0,
        ),
        interpret=os.environ.get("UCOD_PALLAS_INTERPRET", "") not in ("", "0"),
    )(x, w_km, bias.reshape(1, D), pos)


def time_fn(fn, px, *args, iters=30):
    """In-jit loop, perturbed input, scalar readback (bench.py methodology:
    the axon tunnel memoises identical remote calls and its RTT would
    otherwise swamp a sub-ms kernel)."""

    @jax.jit
    def many(px, n):
        def body(i, acc):
            y = fn(px + ((acc % 3.0) * 1e-6).astype(px.dtype), *args)
            return acc + y[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(many(px, 1))  # compile + warm
    best_one = best_n = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(px, 1))
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(many(px, iters + 1))
        best_n = min(best_n, time.perf_counter() - t0)
    return max(best_n - best_one, 1e-9) / iters, jax.block_until_ready(fn(px, *args))


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((B, IMG, IMG, C)), dtype)
    pe_hwio = jnp.asarray(rng.standard_normal((P, P, C, D)) * 0.02, dtype)
    bias = jnp.asarray(rng.standard_normal((D,)) * 0.01, dtype)
    pos = jnp.asarray(rng.standard_normal((L, D)) * 0.01, dtype)

    # weight for the im2col layout: A[l, p_h*42 + (w_col*3+c)] ordering.
    # A column index = p_h*42 + pw*3 + c  (pw = pixel within the patch row,
    # c = channel) -> matches pe[p_h, pw, c, :]
    w_km = pe_hwio.reshape(K, D)

    t_conv, y_conv = time_fn(conv_current, px, pe_hwio, bias, pos)
    try:
        t_pal, y_pal = time_fn(pallas_im2col, px, w_km, bias, pos)
        diff = float(jnp.max(jnp.abs(y_pal.astype(jnp.float32) - y_conv.astype(jnp.float32))))
        print(
            f"conv(current) {t_conv*1e3:.3f} ms   pallas-im2col {t_pal*1e3:.3f} ms   "
            f"maxdiff {diff:.2e}"
        )
    except Exception as e:
        print(f"conv(current) {t_conv*1e3:.3f} ms   pallas-im2col FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
