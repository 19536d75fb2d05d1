"""Time the eval tail (decoder + 68->518 mask upsample) layout variants.

The bench eval body ends with interpolate_bilinear_nhwc on a (B, 68, 68, 1)
logit map: with C=1 the NHWC einsum keeps a single lane live.  Compare with
the (..., H, W) form on the squeezed array (W in lanes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ucod_dpl_tpu.models.dba import init_rev_decoder, rev_decoder_forward_resized
from ucod_dpl_tpu.ops.resize import interpolate_bilinear, interpolate_bilinear_nhwc


def timeit(name, fn, *args, iters=64):
    @jax.jit
    def many(n, *a):
        def body(i, acc):
            eps = (acc % jnp.float32(3)) * 1e-9
            last = jax.tree.map(
                lambda t: t + eps.astype(t.dtype)
                if jnp.issubdtype(t.dtype, jnp.floating)
                else t,
                a[-1],
            )
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
    b, img = 32, 518
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    decoder = init_rev_decoder(k1, 768)
    feats = jax.random.normal(k2, (b, 37, 37, 768), jnp.float32)
    fg = jax.random.normal(k2, (b, 68, 68, 1), jnp.float32)

    def tail_nhwc(dp, ff):
        fgl, _, _ = rev_decoder_forward_resized(dp, ff, 68)
        up = interpolate_bilinear_nhwc(fgl, (img, img))[..., 0]
        return jnp.sum((jax.nn.sigmoid(up) > 0.5).astype(jnp.int32))

    def tail_hw(dp, ff):
        fgl, _, _ = rev_decoder_forward_resized(dp, ff, 68)
        up = interpolate_bilinear(fgl[..., 0], (img, img))
        return jnp.sum((up > 0).astype(jnp.int32))

    timeit("decoder + NHWC upsample + sigmoid>0.5 (current)", tail_nhwc, decoder, feats)
    timeit("decoder + HW upsample + logit>0", tail_hw, decoder, feats)

    timeit("NHWC upsample alone (C=1)", lambda ff: jnp.sum(interpolate_bilinear_nhwc(ff, (img, img))), fg)
    timeit("HW upsample alone (squeezed)", lambda ff: jnp.sum(interpolate_bilinear(ff[..., 0], (img, img))), fg)

    ya = tail_nhwc(decoder, feats)
    yb = tail_hw(decoder, feats)
    print(f"   mask-count diff = {int(ya) - int(yb)}", flush=True)


if __name__ == "__main__":
    main()
