"""Mid-epoch preemption resume must continue the EXACT trajectory.

The preemption checkpoint records phase progress (``phase``/``dis_pass``/
``batch_done``); a resumed run skips the already-applied batches (and an
already-run discriminator inter-training phase) instead of replaying them on
top of state that contains their updates.  These tests pin the resumed run
BITWISE against the uninterrupted one — the guarantee the deterministic
(seed, epoch) loader order exists to provide (SURVEY §5.3/§5.4; the
reference has neither preemption handling nor deterministic resume)."""

import os
import signal
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucod_dpl_tpu.config import CfgNode

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop


def _train_cfg(tmp_path, sub, enable_val=False, save_interval=100):
    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg

    root = tmp_path / sub
    _make_synthetic_dataset(root / "RefCOD", n=8)
    cfg = _tiny_cfg(root)
    cfg.train_cfg = CfgNode(
        {
            "max_epoch": 4,
            "start_finetune": -1,
            "merge_method": "dis",
            "merge_alpha": 0.5,
            "start_epoch": 0,
            "lr0": 2e-4,
            "dis_lr0": 1e-3,
            "dis_intertrain": 2,  # dis inter-training at epochs 0 and 2
            "dis_epoch": 1,
            "step_lr_size": 25,
            "step_lr_gamma": 0.95,
            "save_cfg": {
                "save_mode": "all", "save_interval": save_interval, "start_save": 0,
            },
        }
    )
    cfg.val_cfg.enable_val = enable_val
    cfg.val_cfg.val_interval = 2
    cfg.val_cfg.start_val = 2
    cfg.dataset_cfg.trainloader_cfg.batch_size = 2  # 4 batches / epoch
    cfg.dataset_cfg.trainloader_cfg.shuffle = True  # order must matter

    from ucod_dpl_tpu.utils.fileio import ArrayCache

    rng = np.random.default_rng(0)
    ArrayCache(
        os.path.join(str(root / "cache"), "pseudo_label_cache", "TINY")
    ).dump_list([(rng.random((4, 4, 1)) > 0.5).astype(np.float32) for _ in range(8)])
    return cfg


def _final_params(runner):
    import jax

    return {
        "decoder": [np.asarray(x) for x in jax.tree.leaves(runner.decoder_params)],
        "ema": [np.asarray(x) for x in jax.tree.leaves(runner.decoder_ema_params)],
        "dis": [np.asarray(x) for x in jax.tree.leaves(runner.discriminator_params)],
    }


def _run_uninterrupted(tmp_path, sub, **cfg_kw):
    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.engine.train_loop import TrainLoop

    cfg = _train_cfg(tmp_path, sub, **cfg_kw)
    runner = Runner(cfg, mode="train")
    loop = TrainLoop(cfg, runner)
    loop.run()
    return _final_params(runner), loop.best_mae


def _run_preempted_then_resumed(tmp_path, sub, kind, target_calls, **cfg_kw):
    """Train until the ``target_calls``-th call of ``kind`` completes, inject
    the preemption flag (exactly what the SIGTERM handler does), let the loop
    checkpoint + exit, then resume in a fresh runner and finish.  ``kind``:
    'train'/'dis' fire after a jitted step; 'boundary_save' fires inside the
    epoch-boundary checkpoint save, BEFORE any due validation ran."""
    from ucod_dpl_tpu.engine import Runner, preempt
    from ucod_dpl_tpu.engine.train_loop import TrainLoop

    cfg = _train_cfg(tmp_path, sub, **cfg_kw)
    runner = Runner(cfg, mode="train")
    loop = TrainLoop(cfg, runner)

    if kind == "boundary_save":
        holder, attr = runner, "save_checkpoint"
    else:
        holder, attr = loop, {"train": "_train_step", "dis": "_dis_step"}[kind]
    orig = getattr(holder, attr)
    calls = {"n": 0}

    def wrapped(*a, **k):
        out = orig(*a, **k)
        calls["n"] += 1
        if calls["n"] == target_calls:
            preempt._signum = signal.SIGTERM
        return out

    setattr(holder, attr, wrapped)
    with pytest.raises(SystemExit) as e:
        loop.run()
    assert e.value.code == 128 + signal.SIGTERM
    preempt.clear()

    state_path = os.path.join(runner.ckp_dir, "state_preempt")
    assert os.path.exists(state_path + ".npz")
    import json

    with open(state_path + ".json") as f:
        meta = json.load(f)

    cfg.train_cfg.resume = state_path
    runner2 = Runner(cfg, mode="train")
    loop2 = TrainLoop(cfg, runner2)
    loop2.run()
    return _final_params(runner2), meta, loop2.best_mae


def test_mid_train_phase_resume_is_bitwise(tmp_path):
    """Preempt 2 batches into epoch 2's train phase (after its discriminator
    inter-training already ran): the resume must skip BOTH the dis phase and
    the two applied batches, ending bitwise equal to the uninterrupted run."""
    ref, _ = _run_uninterrupted(tmp_path, "a")
    # per epoch: 4 train batches; epochs 0,1 = 8 calls; +2 -> epoch 2 batch 2
    got, meta, _ = _run_preempted_then_resumed(tmp_path, "b", "train", 10)
    assert meta["phase"] == "train" and meta["batch_done"] == 2
    assert meta["epoch"] == 2
    for k in ref:
        for i, (a, b) in enumerate(zip(got[k], ref[k])):
            np.testing.assert_array_equal(a, b, err_msg=f"{k}[{i}]")


def test_validation_polls_preemption_flag(tmp_path):
    """A preemption signal pending when validation starts must surface as
    Preempted from the eval loop (per-batch poll) rather than being ignored
    until the sweep finishes — the trainer catches it and checkpoints."""
    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.engine import Runner, preempt

    _make_synthetic_dataset(tmp_path / "RefCOD", n=2)
    cfg = _tiny_cfg(tmp_path)
    runner = Runner(cfg, mode="val")
    preempt.install()
    preempt._signum = signal.SIGTERM
    try:
        with pytest.raises(preempt.Preempted):
            runner.launch_val_look_twice()
    finally:
        preempt.clear()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_mid_dis_phase_resume_is_bitwise(tmp_path):
    """Preempt 2 batches into epoch 2's discriminator pass: the resume must
    finish the remaining dis batches, run epoch 2's train phase in full, and
    end bitwise equal to the uninterrupted run."""
    ref, _ = _run_uninterrupted(tmp_path, "a")
    # dis passes: epoch 0 = 4 calls; +2 -> epoch 2 dis batch 2
    got, meta, _ = _run_preempted_then_resumed(tmp_path, "b", "dis", 6)
    assert meta["phase"] == "dis" and meta["batch_done"] == 2
    assert meta["epoch"] == 2
    for k in ref:
        for i, (a, b) in enumerate(zip(got[k], ref[k])):
            np.testing.assert_array_equal(a, b, err_msg=f"{k}[{i}]")


def test_boundary_preempt_reruns_pending_validation(tmp_path):
    """Preempt at the epoch-2 boundary AFTER the checkpoint save but BEFORE
    the due validation ran: the checkpoint records val_pending, the resumed
    run re-runs that validation first, and best-MAE tracking ends equal to
    the uninterrupted run (params bitwise too)."""
    ref, ref_best = _run_uninterrupted(
        tmp_path, "a", enable_val=True, save_interval=2
    )
    got, meta, got_best = _run_preempted_then_resumed(
        tmp_path, "b", "boundary_save", 1, enable_val=True, save_interval=2
    )
    assert meta["epoch"] == 2 and meta.get("val_pending") is True
    assert not meta.get("phase")
    assert np.isfinite(ref_best)
    assert got_best == ref_best
    for k in ref:
        for i, (a, b) in enumerate(zip(got[k], ref[k])):
            np.testing.assert_array_equal(a, b, err_msg=f"{k}[{i}]")
