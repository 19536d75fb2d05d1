"""Training-step tests: optimizer parity with torch, EMA semantics,
end-to-end tiny training run, and data-parallel equivalence on the 8-device
CPU mesh (the gradient sync the reference accidentally disabled)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.engine.train_step import (
    TrainState,
    bce_probs,
    bce_with_logits,
    make_discriminator_step,
    make_optimizer,
    make_train_step,
)


def test_adamw_steplr_matches_torch():
    """Our optax AdamW + per-step StepLR schedule must track torch's
    AdamW + StepLR(step_size, gamma) stepped every batch."""
    import torch

    w0 = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((4, 3)).astype(np.float32)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=2e-4)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.95)

    optimizer = make_optimizer(2e-4, 0.95, 3)
    wj = jnp.asarray(w0)
    state = optimizer.init(wj)

    for _ in range(8):
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()
        sched.step()

        updates, state = optimizer.update(jnp.asarray(g), state, wj)
        wj = optax.apply_updates(wj, updates)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    targets = (rng.random((8, 5)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    assert np.isclose(ours, ref, rtol=1e-6)

    probs = rng.random((8, 1)).astype(np.float32)
    ours_p = float(bce_probs(jnp.asarray(probs), jnp.zeros((8, 1), np.float32)))
    ref_p = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(probs), torch.zeros(8, 1)
    ).item()
    assert np.isclose(ours_p, ref_p, rtol=1e-6)


DIM = 64
FS = 8


def _train_cfg():
    return CfgNode(
        {
            "model_cfg": {"dim": DIM, "feature_size": FS, "ema_weight": 0.99,
                          "dis_use_features": False},
            "train_cfg": {
                "max_epoch": 25,
                "start_finetune": -5,
                "merge_method": "dis",
                "lr0": 2e-4,
                "dis_lr0": 1e-3,
                "step_lr_gamma": 0.95,
                "step_lr_size": 25,
            },
            "log_cfg": {"log_interval": 50},
        }
    )


def _init_state(cfg, optimizer, dis_optimizer, seed=0, dim=None, fs=None):
    from ucod_dpl_tpu.models import init_discriminator
    from ucod_dpl_tpu.models.dba import init_rev_decoder

    dim = DIM if dim is None else dim
    fs = FS if fs is None else fs
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    dec = init_rev_decoder(k1, dim)
    ema = init_rev_decoder(k2, dim)
    dis_p, dis_s = init_discriminator(k3, feature_size=fs, feature_dim=dim, use_features=False)
    return TrainState(
        decoder=dec,
        decoder_ema=ema,
        opt_state=optimizer.init(dec),
        dis_params=dis_p,
        dis_stats=dis_s,
        dis_opt_state=dis_optimizer.init(dis_p),
        ema_step=jnp.zeros((), jnp.int32),
    )


def _batch(seed=0, b=8):
    rng = np.random.default_rng(seed)
    features = rng.standard_normal((b, 6, 6, DIM)).astype(np.float32)
    plabels = (rng.random((b, 16, 16, 1)) > 0.5).astype(np.float32)
    return jnp.asarray(features), jnp.asarray(plabels)


def test_train_step_updates_and_ema():
    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    step = jax.jit(make_train_step(cfg, optimizer))
    state = _init_state(cfg, optimizer, dis_optimizer)
    f, pl = _batch()

    ema_before = np.asarray(state.decoder_ema.decoupling_w)
    dec_before = np.asarray(state.decoder.decoupling_w)

    state1, aux = step(state, f, pl, jnp.float32(0.0), jnp.float32(1.0))
    assert np.isfinite(float(aux["loss"]))
    assert not np.allclose(np.asarray(state1.decoder.decoupling_w), dec_before)
    # first step: global_step=0 -> alpha=min(1-1/1, .99)=0 -> EMA copies student
    np.testing.assert_allclose(
        np.asarray(state1.decoder_ema.decoupling_w),
        np.asarray(state1.decoder.decoupling_w),
        rtol=1e-6,
    )
    assert int(state1.ema_step) == 2

    state2, _ = step(state1, f, pl, jnp.float32(0.0), jnp.float32(1.0))
    # second step: alpha = 1 - 1/3
    alpha = 1.0 - 1.0 / 3.0
    expect = alpha * np.asarray(state1.decoder_ema.decoupling_w) + (1 - alpha) * np.asarray(
        state2.decoder.decoupling_w
    )
    np.testing.assert_allclose(
        np.asarray(state2.decoder_ema.decoupling_w), expect, rtol=1e-5, atol=1e-7
    )


def test_discriminator_step_learns():
    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    dstep = jax.jit(make_discriminator_step(cfg, dis_optimizer))
    state = _init_state(cfg, optimizer, dis_optimizer)
    f, pl = _batch(seed=3)
    losses = []
    for _ in range(10):
        state, aux = dstep(state, f, pl)
        losses.append(float(aux["dis_train_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # discriminator fits the fixed batch


def test_data_parallel_equivalence():
    """One step with the batch sharded over 8 CPU devices must match the
    single-device result — validates the GSPMD gradient psum."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ucod_dpl_tpu.parallel import build_mesh

    cfg = _train_cfg()
    optimizer = make_optimizer(2e-4, 0.95, 25)
    dis_optimizer = make_optimizer(1e-3, 0.95, 25)
    step = jax.jit(make_train_step(cfg, optimizer))
    f, pl = _batch(seed=4, b=8)

    state_a = _init_state(cfg, optimizer, dis_optimizer, seed=7)
    out_a, aux_a = step(state_a, f, pl, jnp.float32(1.0), jnp.float32(1.0))

    mesh = build_mesh({"data": -1, "model": 1})
    assert mesh.devices.size == 8
    shard = NamedSharding(mesh, P("data", None, None, None))
    f_s = jax.device_put(f, shard)
    pl_s = jax.device_put(pl, shard)
    state_b = _init_state(cfg, optimizer, dis_optimizer, seed=7)
    out_b, aux_b = step(state_b, f_s, pl_s, jnp.float32(1.0), jnp.float32(1.0))

    assert np.isclose(float(aux_a["loss"]), float(aux_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_a.decoder.decoupling_w),
        np.asarray(out_b.decoder.decoupling_w),
        rtol=1e-4,
        atol=1e-6,
    )


def test_train_e2e_tiny(tmp_path):
    """Full TrainLoop on a synthetic dataset with a pseudo-label cache."""
    from PIL import Image

    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.utils.fileio import ArrayCache

    _make_synthetic_dataset(tmp_path / "RefCOD", n=4)
    cfg = _tiny_cfg(tmp_path)
    cfg.train_cfg = CfgNode(
        {
            "max_epoch": 2,
            "start_finetune": -1,
            "merge_method": "dis",
            "merge_alpha": 0.5,
            "start_epoch": 0,
            "lr0": 2e-4,
            "dis_lr0": 1e-3,
            "dis_intertrain": 2,
            "dis_epoch": 1,
            "step_lr_size": 25,
            "step_lr_gamma": 0.95,
            "save_cfg": {"save_mode": "model", "save_interval": 1, "start_save": -50},
        }
    )
    cfg.val_cfg.val_interval = 2
    cfg.val_cfg.start_val = 2
    cfg.val_cfg.enable_val = True
    cfg.dataset_cfg.trainloader_cfg.batch_size = 2

    # pseudo-label cache (normally produced by generate_pseudo_label)
    rng = np.random.default_rng(0)
    pl_cache = ArrayCache(os.path.join(str(tmp_path / "cache"), "pseudo_label_cache", "TINY"))
    pl_cache.dump_list([
        (rng.random((4, 4, 1)) > 0.5).astype(np.float32) for _ in range(4)
    ])

    cfg.train_cfg.save_cfg.save_mode = "all"
    runner = Runner(cfg, mode="train")
    runner.launch_train()

    # checkpoints saved each epoch
    import glob

    ckpts = glob.glob(os.path.join(cfg.log_cfg.log_path, "ckp", "epoch*.safetensors"))
    assert len(ckpts) == 2
    # params must have moved and stay finite
    w = np.asarray(runner.decoder_params.decoupling_w)
    assert np.all(np.isfinite(w))

    # full-state checkpoints written; resume continues from the saved epoch
    states = glob.glob(os.path.join(cfg.log_cfg.log_path, "ckp", "state_epoch*.npz"))
    assert len(states) == 2
    resume_base = states[0][: -len(".npz")]
    cfg2 = cfg
    cfg2.train_cfg.resume = resume_base
    cfg2.train_cfg.max_epoch = 3  # one more epoch after the resumed point
    runner2 = Runner(cfg2, mode="train")
    runner2.launch_train()
    assert np.all(np.isfinite(np.asarray(runner2.decoder_params.decoupling_w)))


def test_empty_train_dataloader_raises(tmp_path):
    """batch_size > dataset size with drop_last must fail LOUDLY at runner
    construction — not silently train zero steps per epoch."""
    import pytest

    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.engine import Runner

    _make_synthetic_dataset(tmp_path / "RefCOD", n=2)
    cfg = _tiny_cfg(tmp_path)
    cfg.dataset_cfg.trainloader_cfg.batch_size = 16  # > 2 samples
    with pytest.raises(ValueError, match="Train dataloader is empty"):
        Runner(cfg, mode="train")
