"""Controlled same-process A/B: whole-MLP int8 kernel (LN+quant+fc1+gelu+
requant+fc2 in ONE residency, `layernorm_mlp_w8a8`) vs the split
composition (fused fc1 kernel + separate fc2 int8 dot) on the composed
int8 forward at bs32 @ 518px.

What the fusion buys: the (L, 4D) int8 hidden codes + their scales never
round-trip HBM between fc1 and fc2 (~134MB write+read per layer at bs32).
What it costs: a smaller q-block (128 vs 256 — both weight matrices and
the f32 intermediates must co-reside in VMEM), i.e. more grid steps.

Toggled via UCOD_INT8_WHOLE_MLP (trace-time read in models/dino.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.ops.quant import quantize_dino_linears

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 518


def marginal(fn, iters=8, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); fn(iters + 1); bm = min(bm, time.perf_counter() - t0)
    return (bm - b1) / iters


def build(cfg, params, qparams, dtype):
    @jax.jit
    def loop(px, n):
        def body(_, acc):
            out = dino_forward(
                params, px + acc * 1e-9, cfg, compute_dtype=dtype, quant=qparams
            )["key_features"]
            return acc + jnp.sum(out.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return loop


def main():
    cfg = DinoConfig.dinov2_base()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = init_dino(jax.random.PRNGKey(1), cfg)
    qparams = jax.jit(quantize_dino_linears)(params)
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        rng.standard_normal((BS, IMG, IMG, 3)).astype(np.float32), dtype=dtype
    )
    print(f"backend={jax.default_backend()} bs={BS} img={IMG}")

    results = {}
    for rnd in range(2):
        for name, whole in (("whole-mlp", "1"), ("split", "")):
            os.environ["UCOD_INT8_WHOLE_MLP"] = whole
            jax.clear_caches()
            loop = build(cfg, params, qparams, dtype)
            try:
                float(loop(px, 1))
            except Exception as e:
                print(f"round{rnd} {name:10s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}")
                continue
            t = marginal(lambda n: float(loop(px, n)))
            results.setdefault(name, []).append(t)
            print(f"round{rnd} {name:10s} {t*1e3:7.2f} ms/batch "
                  f"{BS/t:7.1f} img/s")
    os.environ.pop("UCOD_INT8_WHOLE_MLP", None)
    if len(results) == 2:
        tw, ts = min(results["whole-mlp"]), min(results["split"])
        print(f"best whole-mlp {BS/tw:.1f} img/s vs split {BS/ts:.1f} img/s "
              f"({ts/tw:.3f}x)")


if __name__ == "__main__":
    main()
