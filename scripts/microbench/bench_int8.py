"""On-chip int8 W8A8 A/B: raw matmul rate and the composed 518px eval.

Two measurements, run the moment hardware is available:
  1. raw MXU rate of a ViT-shaped matmul chain in int8 (dynamic per-token
     activation quant included — the honest cost) vs bf16: upper-bounds
     what the composed path can gain (v5e datasheet ratio is 2x; the
     dynamic-quant VPU overhead eats some of it);
  2. the composed live-eval path (fg_logits_live @518px) quant vs bf16 —
     the number bench.py reports as the int8 extra.

Timing methodology matches bench.py: iteration loop INSIDE jit, input
perturbed per step from the accumulator, single scalar readback, marginal
cost from minima of 1- and (n+1)-iteration runs (the axon tunnel memoises
identical remote calls; naive loop timing reads ~0 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def min_marginal(run_one, run_many, repeats=3):
    b1 = bm = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); run_one(); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run_many(); bm = min(bm, time.perf_counter() - t0)
    if bm - b1 <= 0:
        # same inverted-timing contract as bench.py: never print a
        # negative/absurd rate as if it were a measurement
        raise RuntimeError(
            f"timing inverted (one={b1:.4f}s many={bm:.4f}s): host too "
            "contended to measure — re-run on a quiet host"
        )
    return bm - b1


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucod_dpl_tpu.engine.runner import _enable_compilation_cache
    from ucod_dpl_tpu.models.dba import fg_logits_live, init_rev_decoder
    from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
    from ucod_dpl_tpu.ops.quant import dense_w8a8, quantize_dino_linears, quantize_linear

    _enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({jax.default_backend()})")
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    # off-TPU this is a WIRING smoke, not a measurement: the production
    # shapes are minutes-per-iteration on a 1-CPU host
    iters = 16 if on_tpu else 2

    # ---- 1. raw matmul chain: (B*N, 768) x (768, 3072) x (3072, 768) ------
    n_tok = 16 * 1370 if on_tpu else 512  # bs16 @ 518px token count
    x0 = jnp.asarray(rng.standard_normal((n_tok, 768)).astype(np.float32), dtype=dtype)
    w1 = {"w": jnp.asarray(rng.standard_normal((768, 3072)).astype(np.float32)) * 0.02,
          "b": jnp.zeros((3072,), jnp.float32)}
    w2 = {"w": jnp.asarray(rng.standard_normal((3072, 768)).astype(np.float32)) * 0.02,
          "b": jnp.zeros((768,), jnp.float32)}
    q1, q2 = quantize_linear(w1), quantize_linear(w2)
    flops = 2 * n_tok * (768 * 3072 + 3072 * 768) * iters

    @jax.jit
    def chain_bf16(x, n):
        def body(i, acc):
            h = jnp.dot((x + acc * 1e-9).astype(dtype), w1["w"].astype(dtype)) + w1["b"].astype(dtype)
            h = jnp.dot(h, w2["w"].astype(dtype)) + w2["b"].astype(dtype)
            return acc + jnp.sum(h.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def chain_int8(x, n):
        def body(i, acc):
            h = dense_w8a8((x + acc * 1e-9).astype(dtype), q1, dtype)
            h = dense_w8a8(h, q2, dtype)
            return acc + jnp.sum(h.astype(jnp.float32) ** 2) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    for name, fn in (("bf16", chain_bf16), ("int8", chain_int8)):
        float(fn(x0, 1))  # compile + warm
        dt = min_marginal(lambda: float(fn(x0, 1)), lambda: float(fn(x0, iters + 1)))
        print(f"matmul chain {name}: {dt / iters * 1e3:.3f} ms/iter  "
              f"{flops / dt / 1e12:.1f} TFLOP-equiv/s")

    # ---- 2. composed 518px live eval ---------------------------------------
    cfg = DinoConfig.dinov2_base()
    if not on_tpu:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_layers=2)
    backbone = init_dino(jax.random.PRNGKey(1), cfg)
    decoder = init_rev_decoder(jax.random.PRNGKey(2), cfg.hidden_size)
    qparams = jax.jit(quantize_dino_linears)(backbone)
    batch, img = (32, 518) if on_tpu else (2, 126)
    px = jnp.asarray(rng.standard_normal((batch, img, img, 3)).astype(np.float32))
    ev_iters = 8 if on_tpu else 2

    def make(quant):
        @jax.jit
        def many(bb, qp, dec, pixels, n):
            def body(i, acc):
                fg, _, _ = fg_logits_live(
                    bb, dec, pixels + (acc % 3).astype(pixels.dtype) * 1e-6,
                    cfg, compute_dtype=dtype, size=68, quant=qp if quant else None,
                )
                return acc + jnp.sum((fg > 0).astype(jnp.int32))
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return many

    for name, quant in (("bf16" if on_tpu else "f32", False), ("int8", True)):
        fn = make(quant)
        int(fn(backbone, qparams, decoder, px, 1))
        dt = min_marginal(
            lambda: int(fn(backbone, qparams, decoder, px, 1)),
            lambda: int(fn(backbone, qparams, decoder, px, ev_iters + 1)),
        )
        print(f"518px live eval {name}: {batch * ev_iters / dt:.1f} img/s")


if __name__ == "__main__":
    main()
