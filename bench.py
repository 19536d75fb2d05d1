"""Benchmark: end-to-end eval throughput (images/sec/chip) at 518px.

Measures the LIVE-INFERENCE composition — DINOv2-base ViT forward (Pallas
flash attention, bf16) with the decoder's decoupling key-folded into the
last key projection (``models/dba.py::fg_logits_live``), decoder body,
mask upsample + threshold. This is exactly what serving and the LookTwice
crop pass execute per image. Composition note for cross-round comparison:
rounds 1-3 timed the unfolded variant (full 768-dim key map -> separate
decoupling), which is what the one-time feature-CACHE build still runs —
the round-4 key-fold is worth ~1% of the 491 -> 516 gain (the rest, the
shift-invariant softmax kernel, applies to both compositions; see
scripts/microbench/README.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the driver's A100 PyTorch reference
point (BASELINE.json targets >=5x images/sec/chip at 518px eval); the A100
eager-fp16 HF-transformers baseline for ViT-B/14 @ 518px + decoder is taken
as 100 img/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_PYTORCH_BASELINE_IMGS_PER_SEC = 100.0


def main():
    import threading

    # backend discovery over the axon tunnel can hang INDEFINITELY when the
    # remote agent holds a stale claim (observed after a client was killed
    # mid-remote-compile): bound it so a wedged tunnel fails loudly instead
    # of hanging the driver forever.  jax.devices() normally returns in
    # seconds; 600s is far beyond any healthy init.
    ready = threading.Event()

    def watchdog():
        if not ready.wait(600.0):
            print(
                "bench.py: backend discovery exceeded 600s — the TPU tunnel "
                "appears wedged (stale remote claim?); aborting",
                file=sys.stderr,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.devices()
    ready.set()

    from ucod_dpl_tpu.engine.runner import _enable_compilation_cache

    _enable_compilation_cache()  # repeat runs skip the (remote) compile

    from ucod_dpl_tpu.models.dba import fg_logits_live, init_rev_decoder
    from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
    from ucod_dpl_tpu.ops.resize import interpolate_bilinear_nhwc

    cfg = DinoConfig.dinov2_base()
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)

    # bs32 measured fastest per-image (scripts/microbench/bench_batch_sweep2.py,
    # post-key-fold: 24 -> 493, 32 -> 497, 40 -> 495, 48 -> 491 img/s)
    batch = 32 if on_tpu else 2
    img = 518

    def eval_body(backbone_params, decoder_params, pixels):
        # the exact live-inference composition serving/eval run: key-fold
        # fast path (decoupling folded into the last key projection — see
        # models/dba.py::fg_logits_live), decoder body at 68, mask upsample
        fg, _, _ = fg_logits_live(
            backbone_params, decoder_params, pixels, cfg,
            compute_dtype=compute_dtype, size=68,
        )
        up = interpolate_bilinear_nhwc(fg, (img, img))[..., 0]
        masks = jax.nn.sigmoid(up) > 0.5
        return jnp.sum(masks.astype(jnp.int32))

    iters = 8 if on_tpu else 2

    @jax.jit
    def eval_many(backbone_params, decoder_params, pixels, n):
        # the iteration loop lives inside jit with a single scalar readback:
        # device-to-host latency over the axon tunnel (~30ms RTT) must not be
        # billed to the compute; the input is perturbed per iteration so no
        # step can be CSE'd away.
        def body(i, acc):
            return acc + eval_body(
                backbone_params, decoder_params, pixels + (acc % 3).astype(pixels.dtype) * 1e-6
            )

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch, img, img, 3)).astype(np.float32))

    # warmup / compile (scalar readback = real synchronisation), plus an
    # on-hardware numerics guard: the composed program must produce FINITE
    # logits.  A silent NaN forward times identically to a correct one —
    # this caught a real bug (garbage in XLA tile padding beyond seq_len
    # turning the kernel's additive boundary mask into NaN, round 4) that
    # no CPU/interpret-mode test can see.
    def logits_small(backbone_params, decoder_params, px2):
        fg, _, _ = fg_logits_live(
            backbone_params, decoder_params, px2, cfg,
            compute_dtype=compute_dtype, size=68,
        )
        return jnp.sum(jnp.isfinite(fg)), fg.size

    finite, total = jax.jit(logits_small)(backbone, decoder, pixels[:2])
    assert int(finite) == int(total), (
        f"NON-FINITE decoder logits on {jax.default_backend()}: "
        f"{int(total) - int(finite)}/{int(total)} bad — refusing to bench a broken forward"
    )

    int(eval_many(backbone, decoder, pixels, 1))

    # tunneled chips show large run-to-run timing noise (host RTT spikes,
    # shared terminal contention); estimate the marginal per-iteration cost
    # from the MINIMA of the 1-iteration and (iters+1)-iteration timings
    # taken separately — the min of each is its cleanest measurement, while
    # a paired (many - one) with a noisy `one` would INFLATE the rate
    best_one = float("inf")
    best_many = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(eval_many(backbone, decoder, pixels, 1))
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        checksum = int(eval_many(backbone, decoder, pixels, iters + 1))
        best_many = min(best_many, time.perf_counter() - t0)
        assert checksum >= 0
    best_dt = best_many - best_one
    # sanity: timing noise can invert many/one on a badly contended host —
    # an absurd implied rate must FAIL loudly, not print a nonsense JSON
    # line a driver would record as a measurement
    if best_dt <= 0 or batch * iters / best_dt > 50_000:
        raise RuntimeError(
            f"timing inverted/absurd (one={best_one:.4f}s many={best_many:.4f}s): "
            "host too contended to measure — re-run on a quiet host"
        )

    imgs_per_sec = batch * iters / best_dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip at 518px eval (dinov2-base + DBA decoder)",
                "value": round(imgs_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / A100_PYTORCH_BASELINE_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
