"""On-chip flash-attention VJP: correctness vs the XLA VJP + LoRA-step timing.

Measures the differentiated backbone pass (the LoRA adaptation hot path,
bs16 @ 518px ViT-B) two ways:
  * flash VJP: Pallas forward kernel + the recompute-based backward kernels
    (ops/attention.py::_pallas_attention_packed_bwd);
  * XLA fallback: UCOD_ATTN_XLA_VJP=1 escape hatch (XLA attention fwd+bwd,
    what every differentiated path used before round 5).

Timing methodology matches bench.py: the iteration loop lives INSIDE jit
(single scalar readback — the axon tunnel's ~27ms RTT and its caching of
identical remote calls must not leak into the numbers), inputs perturbed
per iteration so no step can be CSE'd, marginal cost from the minima of
1-iteration and (n+1)-iteration timings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def build(use_xla_vjp: bool, cfg, compute_dtype):
    import jax
    import jax.numpy as jnp

    from ucod_dpl_tpu.models.lora import lora_forward

    if use_xla_vjp:
        os.environ["UCOD_ATTN_XLA_VJP"] = "1"
    else:
        os.environ.pop("UCOD_ATTN_XLA_VJP", None)

    def loss(lora_p, backbone_params, pixels):
        out = lora_forward(
            jax.lax.stop_gradient(backbone_params), lora_p, pixels, cfg,
            compute_dtype=compute_dtype, remat=True,
        )
        return jnp.sum(out["key_features"].astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    def gsum(lora_p, backbone_params, pixels):
        g = grad(lora_p, backbone_params, pixels)
        return sum(
            jnp.sum(e[t][ab]).astype(jnp.float32)
            for e in g for t in e for ab in ("a", "b")
        )

    @jax.jit
    def many(lora_p, backbone_params, pixels, n):
        def body(i, acc):
            return acc + gsum(
                lora_p, backbone_params, pixels + (acc % 3.0) * 1e-6
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return jax.jit(grad), many


def time_many(many, lora, backbone, px, iters):
    import jax

    float(many(lora, backbone, px, 1))  # compile + warm
    best_one = best_n = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(lora, backbone, px, 1))
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(many(lora, backbone, px, iters + 1))
        best_n = min(best_n, time.perf_counter() - t0)
    return max(best_n - best_one, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucod_dpl_tpu.engine.runner import _enable_compilation_cache
    from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
    from ucod_dpl_tpu.models.lora import init_lora

    _enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = DinoConfig.dinov2_base()
    backbone = init_dino(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), backbone, rank=2)
    # nonzero B so dK/dV actually matter in the comparison
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    bs = 16 if on_tpu else 1
    img = 518 if on_tpu else 56
    iters = 8 if on_tpu else 2
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((bs, img, img, 3)).astype(np.float32)
    )

    grad_flash, many_flash = build(False, cfg, compute_dtype)
    t_flash = time_many(many_flash, lora, backbone, px, iters)
    g_flash = jax.block_until_ready(grad_flash(lora, backbone, px))

    grad_xla, many_xla = build(True, cfg, compute_dtype)
    t_xla = time_many(many_xla, lora, backbone, px, iters)
    g_xla = jax.block_until_ready(grad_xla(lora, backbone, px))
    os.environ.pop("UCOD_ATTN_XLA_VJP", None)

    flat_f, _ = jax.tree.flatten(g_flash)
    flat_x, _ = jax.tree.flatten(g_xla)
    # norm-relative per leaf: robust to tiny-magnitude entries
    rel = max(
        float(jnp.linalg.norm((a - b).astype(jnp.float32).ravel())
              / (jnp.linalg.norm(b.astype(jnp.float32).ravel()) + 1e-9))
        for a, b in zip(flat_f, flat_x)
    )
    finite = all(bool(jnp.isfinite(a.astype(jnp.float32)).all()) for a in flat_f)
    print(
        f"backend={jax.default_backend()} bs={bs}@{img}px  "
        f"flash-vjp {t_flash*1e3:.1f} ms/step  xla-vjp {t_xla*1e3:.1f} ms/step  "
        f"speedup x{t_xla/t_flash:.2f}  grad norm-rel-diff {rel:.2e}  finite={finite}"
    )
    assert finite, "non-finite flash-VJP gradients"


if __name__ == "__main__":
    main()
