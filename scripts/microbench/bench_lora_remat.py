"""A/B the LoRA joint train step's remat mode on chip (VERDICT r4 #4).

The step's backward pays for activation memory with recompute; the three
modes trade differently:

  layer — jax.checkpoint per block: only block inputs saved, the WHOLE layer
          forward replays in the backward (~+1 fwd of MXU work).  The
          round-4 default (BENCH_r04: 127.94 ms/step, ~0.43 model-MFU).
  dots  — jax.checkpoint(policy=dots_with_no_batch_dims_saveable): matmul
          outputs saved, only elementwise chains (LN, gelu, residuals)
          replay — the backward's extra FLOPs drop to VPU-only work for
          ~40% of no-remat memory.
  none  — no remat: every activation saved (cheapest compute; feasibility
          depends on batch x resolution fitting HBM).

Usage: python scripts/microbench/bench_lora_remat.py [bs] [img]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

import jax
import jax.numpy as jnp

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.engine.train_step import (
    TrainState,
    make_lora_train_step,
    make_optimizer,
)
from ucod_dpl_tpu.models import init_discriminator
from ucod_dpl_tpu.models.dba import init_rev_decoder
from ucod_dpl_tpu.models.dino import DinoConfig, init_dino
from ucod_dpl_tpu.models.lora import init_lora


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 518
    cfg = DinoConfig.dinov2_base()
    compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    fs = (img // cfg.patch_size) * 2 - 6  # 68 at 518px, like the bench
    print(f"backend={jax.default_backend()} bs={bs} img={img} fs={fs}")

    rng = np.random.default_rng(0)
    backbone = init_dino(jax.random.PRNGKey(1), cfg)
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dec = init_rev_decoder(k1, cfg.hidden_size)
    dis_p, dis_s = init_discriminator(
        k3, feature_size=fs, feature_dim=cfg.hidden_size, use_features=False
    )
    state = TrainState(
        decoder=dec,
        decoder_ema=init_rev_decoder(k2, cfg.hidden_size),
        opt_state=optimizer.init(dec),
        dis_params=dis_p,
        dis_stats=dis_s,
        dis_opt_state=dis_optimizer.init(dis_p),
        ema_step=jnp.zeros((), jnp.int32),
    )
    lora_opt = make_optimizer(1e-4, 0.95, 25)
    lora_params = init_lora(jax.random.PRNGKey(9), backbone, rank=2)
    lora_opt_state = lora_opt.init(lora_params)
    g = img // cfg.patch_size
    pixels = jnp.asarray(rng.standard_normal((bs, img, img, 3)).astype(np.float32))
    plabels = jnp.asarray((rng.random((bs, g, g, 1)) > 0.5).astype(np.float32))

    modes = ("layer", "dots", "none")
    if len(sys.argv) > 3:  # optional: restrict to one mode (slow compiles)
        modes = (sys.argv[3],)
    for mode in modes:
        ltcfg = CfgNode(
            {
                "model_cfg": {
                    "dim": cfg.hidden_size, "feature_size": fs,
                    "ema_weight": 0.99, "dis_use_features": False,
                    "lora": {"rank": 2, "alpha": 4.0, "remat": mode},
                },
                "train_cfg": {
                    "max_epoch": 25, "start_finetune": -5, "merge_method": "dis",
                    "lr0": 2e-4, "step_lr_gamma": 0.95, "step_lr_size": 25,
                },
            }
        )
        try:
            lstep = jax.jit(
                make_lora_train_step(ltcfg, optimizer, lora_opt, cfg, compute_dtype)
            )

            def run(n):
                s, lp, lo, aux = state, lora_params, lora_opt_state, None
                for _ in range(n):
                    s, lp, lo, aux = lstep(
                        s, lp, lo, backbone, pixels, plabels,
                        jnp.float32(1.0), jnp.float32(1.0),
                    )
                float(aux["loss"])

            run(1)  # compile + warm
            iters = 4
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                run(1)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                run(iters + 1)
                tn = time.perf_counter() - t0
                best = min(best, (tn - t1) / iters)
            # executed flops from XLA's cost analysis
            try:
                cost = lstep.lower(
                    state, lora_params, lora_opt_state, backbone, pixels,
                    plabels, jnp.float32(1.0), jnp.float32(1.0),
                ).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0] if cost else {}
                hw = cost.get("flops")
            except Exception:
                hw = None
            hw_s = f" executed={hw/1e12:.2f}TF" if hw else ""
            print(f"remat={mode:6s} {best*1e3:8.2f} ms/step{hw_s}")
        except Exception as e:
            print(f"remat={mode:6s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
