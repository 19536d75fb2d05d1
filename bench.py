"""Benchmark: end-to-end eval throughput (images/sec/chip) at 518px.

Measures the framework's hot path — DINOv2-base ViT forward (Pallas flash
attention, bf16) + feature interpolation + DBA decoder + mask upsample, i.e.
exactly what stage-1 evaluation / feature-cache building runs per image.

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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucod_dpl_tpu.models.dba import init_rev_decoder, rev_decoder_forward
    from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
    from ucod_dpl_tpu.ops import interpolate_bilinear

    cfg = DinoConfig.dinov2_base()
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    backbone = init_dino(k1, cfg)
    decoder = init_rev_decoder(k2, cfg.hidden_size)

    batch = 16 if on_tpu else 2
    img = 518

    @jax.jit
    def eval_step(backbone_params, decoder_params, pixels):
        out = dino_forward(backbone_params, pixels, cfg, compute_dtype=compute_dtype)
        feats = out["key_features"].astype(jnp.float32)
        f68 = interpolate_bilinear(jnp.transpose(feats, (0, 3, 1, 2)), (68, 68)).transpose(
            0, 2, 3, 1
        )
        fg, _, _ = rev_decoder_forward(decoder_params, f68, with_loss=False)
        up = interpolate_bilinear(jnp.transpose(fg, (0, 3, 1, 2)), (img, img))
        masks = jax.nn.sigmoid(up[:, 0]) > 0.5
        # scalar checksum: forces full execution through a reliable readback
        # path (large-array D2H over the axon tunnel is not dependable for
        # timing), while XLA cannot elide any of the pipeline.
        return jnp.sum(masks.astype(jnp.int32))

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch, img, img, 3)).astype(np.float32))

    # warmup / compile (scalar readback = real synchronisation)
    int(eval_step(backbone, decoder, pixels))

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum = int(eval_step(backbone, decoder, pixels))
    dt = time.perf_counter() - t0
    assert checksum >= 0

    imgs_per_sec = batch * iters / dt
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
