"""CORAL stage-2 end-to-end tests on the synthetic tiny dataset, plus
parity of the 2x2 m-patch stitcher."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.engine.coral_loop import concate_m_patch_preds
from ucod_dpl_tpu.engine.runner import LocalRefineRunner

from test_eval_e2e import DIM, _make_synthetic_dataset, _tiny_cfg

# the e2e runner tests are heavy (marked individually); the pure stitching
# unit test stays in the quick loop


def test_concate_m_patch_preds_matches_reference_semantics():
    """2x2 stitching with stride 34 over a 102 canvas (loop_CORAL.py:62-96)."""
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((2, 4, 68, 68, 1)).astype(np.float32)
    out = np.asarray(concate_m_patch_preds(jnp.asarray(preds)))
    # manual reference computation
    canvas = np.zeros((2, 102, 102, 1), np.float32)
    counter = np.zeros_like(canvas)
    for idx, (i, j) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        canvas[:, i * 34 : i * 34 + 68, j * 34 : j * 34 + 68] += preds[:, idx]
        counter[:, i * 34 : i * 34 + 68, j * 34 : j * 34 + 68] += 1
    np.testing.assert_allclose(out, canvas / (counter + 1e-6), rtol=1e-6)


def _coral_cfg(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.model_cfg.window_size = 3
    cfg.model_cfg.window_length = 8
    cfg.model_cfg.threshold = 0.0015
    cfg.train_cfg = CfgNode(
        {
            "max_epoch": 1,
            "lr0": 1e-4,
            "step_lr_size": 2,
            "step_lr_gamma": 0.95,
            "start_finetune": -5,
        }
    )
    cfg.val_cfg.val_interval = 100  # no val during tiny training
    cfg.val_cfg.start_val = 100
    cfg.dataset_cfg.valset_cfg.use_cache = True
    cfg.dataset_cfg.valset_cfg.require_m_patches = False
    cfg.dataset_cfg.trainset_cfg.use_cache = True
    cfg.dataset_cfg.trainset_cfg.require_m_patches = False
    cfg.dataset_cfg.trainset_cfg.require_label = True
    cfg.dataset_cfg.trainloader_cfg.batch_size = 2
    return cfg


@pytest.mark.heavy
def test_coral_eval_e2e(tmp_path):
    _make_synthetic_dataset(tmp_path / "RefCOD", n=3)
    cfg = _coral_cfg(tmp_path)
    runner = LocalRefineRunner(cfg, mode="eval")
    result = runner.launch_val()
    for key in ["SMeasure", "MAE", "WFM"]:
        assert np.isfinite(result[key])
    preds_dir = os.path.join(cfg.log_cfg.log_path, "preds", "TINY")
    assert len(os.listdir(preds_dir)) == 3


@pytest.mark.heavy
def test_coral_eval_with_m_patches_and_crop_center(tmp_path):
    """m-patch stitched coarse predictions + the centre-crop feature path."""
    _make_synthetic_dataset(tmp_path / "RefCOD", n=2)
    cfg = _coral_cfg(tmp_path)
    cfg.dataset_cfg.valset_cfg.require_m_patches = True
    runner = LocalRefineRunner(cfg, mode="eval")
    result = runner.launch_val()
    assert np.isfinite(result["MAE"])

    # centre-crop fallback path produces consistent shapes
    path = str(runner.val_dataset.image_paths[0])
    l_c, h_c, m_c = runner.val_dataset.get_features(path, crop_center=True)
    assert l_c.ndim == 4 and h_c.ndim == 5
    from ucod_dpl_tpu.engine.coral_loop import LocalRefineEvaluator

    ev = LocalRefineEvaluator(cfg, runner)
    l_feat, h_feat, preds = ev._prepare(
        np.asarray(l_c, np.float32), np.asarray(h_c, np.float32),
        np.asarray(m_c, np.float32) if m_c is not None else None,
    )
    wl = cfg.model_cfg.window_length
    assert l_feat.shape[1:3] == (wl, wl)
    assert preds.shape[1] in (102, wl)  # m-patch canvas or direct
    padded = ev._center_pad(np.zeros((1, 10, 12, 1), np.float32))
    assert padded.shape == (1, 20, 24, 1)
    assert padded[0, 0, 0, 0] == -10.0
    assert padded[0, 5, 6, 0] == 0.0


@pytest.mark.heavy
def test_coral_train_e2e(tmp_path):
    _make_synthetic_dataset(tmp_path / "RefCOD", n=4)
    cfg = _coral_cfg(tmp_path)
    runner = LocalRefineRunner(cfg, mode="train")
    before = np.asarray(runner.refiner_params["csf"]["mask_dec"]["w"]).copy()
    runner.launch_train()
    after = np.asarray(runner.refiner_params["csf"]["mask_dec"]["w"])
    assert np.all(np.isfinite(after))
    assert not np.allclose(before, after)
    # refiner checkpoint saved and reloadable
    import glob

    from ucod_dpl_tpu.models.udlr import load_refiner_checkpoint

    ckpts = glob.glob(os.path.join(runner.log_path, "refiner_ckp", "*.safetensors"))
    assert ckpts
    loaded = load_refiner_checkpoint(ckpts[0])
    np.testing.assert_allclose(
        np.asarray(loaded["csf"]["mask_dec"]["w"]), after, rtol=1e-6
    )


@pytest.mark.heavy
def test_coral_eval_batched_matches_bs1(tmp_path):
    """Stage-2 eval must accept val batch_size > 1 with identical metrics
    (the reference is hard-wired to bs=1, loop_CORAL.py:139)."""
    _make_synthetic_dataset(tmp_path / "RefCOD", n=3)
    cfg = _coral_cfg(tmp_path)
    cfg.dataset_cfg.valset_cfg.require_m_patches = True
    r1 = LocalRefineRunner(cfg, mode="eval").launch_val()
    cfg.dataset_cfg.val_loader_cfg.batch_size = 2  # 2 + padded tail of 1
    r2 = LocalRefineRunner(cfg, mode="eval").launch_val()
    for k in ("MAE", "SMeasure", "E_MEAN", "F_MEAN", "WFM"):
        assert np.isclose(r1[k], r2[k]), (k, r1[k], r2[k])


@pytest.mark.heavy
def test_coral_train_preempt_and_resume(tmp_path, monkeypatch):
    """Stage-2 preemption: the deferred flag is honoured at the next step
    boundary — the trainer saves an ``epoch{N}_preempt`` refiner and exits
    128+SIGTERM; a new runner restarted from that checkpoint (the logged
    ``--refiner_path`` guidance) completes cleanly with the saved weights."""
    import glob

    from ucod_dpl_tpu.engine import preempt
    from ucod_dpl_tpu.models.udlr import load_refiner_checkpoint

    _make_synthetic_dataset(tmp_path / "RefCOD", n=4)
    cfg = _coral_cfg(tmp_path)
    cfg.train_cfg.max_epoch = 10_000  # must be cut short by the flag
    runner = LocalRefineRunner(cfg, mode="train")

    calls = {"n": 0, "armed": True}

    def flag_after_three(*a, **k):
        # two train batches poll first (n=4, bs=2), then a boundary poll
        calls["n"] += 1
        return 15 if calls["armed"] and calls["n"] >= 3 else None

    monkeypatch.setattr(preempt, "requested_global", flag_after_three)

    with pytest.raises(SystemExit) as ei:
        runner.launch_train()
    assert ei.value.code == 128 + 15

    ckpts = glob.glob(
        os.path.join(runner.log_path, "refiner_ckp", "*_preempt.safetensors")
    )
    assert len(ckpts) == 1, ckpts
    saved = load_refiner_checkpoint(ckpts[0])
    np.testing.assert_allclose(
        np.asarray(saved["csf"]["mask_dec"]["w"]),
        np.asarray(runner.refiner_params["csf"]["mask_dec"]["w"]),
        rtol=1e-6,
    )

    # restart from the preempt checkpoint (fresh runner, short schedule);
    # the injected flag is disarmed — the signal was 'delivered' once
    calls["armed"] = False
    cfg2 = _coral_cfg(tmp_path)
    runner2 = LocalRefineRunner(cfg2, mode="train", refiner_path=ckpts[0])
    np.testing.assert_allclose(
        np.asarray(runner2.refiner_params["csf"]["mask_dec"]["w"]),
        np.asarray(saved["csf"]["mask_dec"]["w"]),
        rtol=1e-6,
    )
    runner2.launch_train()
    assert np.all(
        np.isfinite(np.asarray(runner2.refiner_params["csf"]["mask_dec"]["w"]))
    )


@pytest.mark.heavy
def test_refine_predictor_matches_eval_cli(tmp_path):
    """Stage-2 serving (RefinePredictor) must reproduce the CORAL eval
    loop's saved masks on the same images with the same weights — the
    serving path extracts features LIVE while the eval loop reads caches,
    so agreement also pins cache==live extraction."""
    from PIL import Image

    from ucod_dpl_tpu.serving import RefinePredictor

    _make_synthetic_dataset(tmp_path / "RefCOD", n=3)
    cfg = _coral_cfg(tmp_path)
    runner = LocalRefineRunner(cfg, mode="eval")
    runner.launch_val()  # writes preds/TINY/*.png at label resolution

    rp = RefinePredictor(
        runner.val_dataset.feature_extractor,
        runner.decoder_params,
        runner.refiner_params,
        image_size=tuple(cfg.dataset_cfg.valset_cfg.image_size),
        window_size=cfg.model_cfg.window_size,
        window_length=cfg.model_cfg.window_length,
        threshold=cfg.model_cfg.threshold,
        use_m_patches=False,
        max_batch=2,
    )
    preds_dir = os.path.join(runner.log_path, "preds", "TINY")
    paths = list(runner.val_dataset.image_paths)
    assert len(paths) == 3
    for p in paths:
        name = os.path.splitext(os.path.basename(str(p)))[0] + ".png"
        saved = np.asarray(Image.open(os.path.join(preds_dir, name)))
        mask = rp.predict([str(p)], output_size=saved.shape[:2])[0]
        agree = np.mean((mask > 0.5) == (saved > 127))
        assert agree == 1.0, (p, agree)


@pytest.mark.heavy
def test_refine_predictor_m_patches_and_batching(tmp_path):
    """m-patch path smoke + batch invariance + input validation."""
    from ucod_dpl_tpu.models.udlr import init_sparse_refiner
    from ucod_dpl_tpu.serving import RefinePredictor

    import jax

    from test_eval_e2e import DIM as _DIM
    from ucod_dpl_tpu.config import CfgNode
    from ucod_dpl_tpu.data.feature_extractor import FeatureExtractor
    from ucod_dpl_tpu.models.dba import init_rev_decoder

    fe = FeatureExtractor(
        CfgNode(
            {
                "type": "dinov2",
                "backbone": "facebook/dinov2-base",
                "backbone_weights": "none",
                "arch": {"hidden_size": _DIM, "num_layers": 2, "num_heads": 4,
                         "patch_size": 14, "image_size": 56},
            }
        )
    )
    rp = RefinePredictor(
        fe,
        init_rev_decoder(jax.random.PRNGKey(0), _DIM),
        init_sparse_refiner(jax.random.PRNGKey(1), dim=_DIM),
        image_size=(56, 56),
        window_size=3,
        window_length=8,
        use_m_patches=True,
        max_batch=2,
    )
    rng = np.random.default_rng(0)
    imgs = [(rng.random((60 + 4 * i, 72, 3)) * 255).astype(np.uint8) for i in range(3)]
    singly = [rp.predict([im])[0] for im in imgs]
    batched = rp.predict(imgs)  # 2 + padded tail chunk
    for a, b in zip(singly, batched):
        assert a.shape == (56, 56)
        assert set(np.unique(a)).issubset({0.0, 1.0})
        np.testing.assert_array_equal(a, b)
    (soft,) = rp.predict([imgs[0]], soft=True, output_size=(60, 72))
    assert soft.shape == (60, 72) and soft.min() >= 0.0 and soft.max() <= 1.0

    with pytest.raises(ValueError, match="original pixels"):
        rp.predict([np.zeros((56, 56, 3), np.float32)])
