"""Whole-pipeline equivalence: the PyTorch reference's own eval loops run as
oracles on a shared synthetic dataset with shared (converted) weights, and
our evaluators must reproduce their metric dicts.

Per-component parity (decoder, backbone, metrics, LookTwice math) is covered
elsewhere; this test catches *composition* drift — interpolation order,
threshold placement, binarisation points, connected-component partitioning,
keep_size handling — by comparing the final metric dictionaries and the
saved prediction masks end-to-end.

Oracle: ``ValLoop_Look_Twice`` (/root/reference/engine/runner/loop_UCOD_DPL.py:276-417)
Ours:   ``engine.eval_loop.LookTwiceEvaluator``

The two sides share:
  * the image/GT files (synthetic, blobby objects);
  * the DINO backbone weights (one seeded HF Dinov2Model, converted);
  * the decoder checkpoint (ours, saved in the reference safetensors layout);
  * the feature cache on disk (the reference builds it; we read its pickles).
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

from conftest import reference_available

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ref_pipeline_harness import (
    FakeRunner,
    SilentLogger,
    build_shared_backbone,
    confident_decoder_params,
    import_reference,
    make_synthetic_dataset,
    patch_cuda_to_cpu,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

DIM = 768
IMG = 56  # eval image size: 4x4 patch grid at patch 14
FEAT = 8  # decoder feature_size


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def _ref_cfg(ref, tmp_path):
    return ref.config.CfgNode(
        {
            "train_cfg": {"dist_train": False},
            "val_cfg": {
                "look_twice": True,
                "look_twice_th": 0.95,  # force the zoom-in path
                "expand_type": "dynamic",
            },
            "model_cfg": {"dim": DIM, "feature_size": FEAT},
            "log_cfg": {"log_path": str(tmp_path / "ref_logs")},
            "dataset_cfg": {
                "dataset_dir": str(tmp_path / "data"),
                "cache_dir": str(tmp_path / "cache"),
                "feature_extractor_cfg": {
                    "type": "dinov2",
                    "backbone_type": "huggingface",
                    "backbone": "facebook/dinov2-base",
                    "backbone_weights": str(tmp_path / "none"),
                    "backbone_weight_base": str(tmp_path / "none"),
                },
                "valset_cfg": {
                    "DATASET": "TINY",
                    "image_size": (IMG, IMG),
                    "require_label": True,
                },
                "val_loader_cfg": {"batch_size": 1, "num_workers": 0},
            },
        }
    )


def _our_cfg(tmp_path):
    from ucod_dpl_tpu.config import CfgNode

    return CfgNode(
        {
            "work_dir": str(tmp_path / "work"),
            "mode": "eval",
            "seed": 42,
            "model_cfg": {"dim": DIM, "feature_size": FEAT, "dis_use_features": False,
                          "ema_weight": 0.99},
            "val_cfg": {
                "look_twice": True,
                "look_twice_th": 0.95,
                "expand_type": "dynamic",
                "enable_val": True,
            },
            "log_cfg": {"log_path": str(tmp_path / "our_logs"), "multi_rank": [0]},
            "tpu_cfg": {"mesh": {"data": -1, "model": 1}},
            "dataset_cfg": {
                "dataset_dir": str(tmp_path / "data"),
                "cache_dir": str(tmp_path / "cache"),
                "valset_cfg": {
                    "DATASET": "TINY",
                    "require_label": True,
                    "image_size": (IMG, IMG),
                    "keep_size": True,
                },
                "trainset_cfg": {
                    "DATASET": "TINY",
                    "require_label": False,
                    "image_size": (IMG, IMG),
                    "bkg_th": 0.6,
                },
                "val_loader_cfg": {"batch_size": 1},
                "trainloader_cfg": {"batch_size": 2, "shuffle": True},
                "feature_extractor_cfg": {
                    "type": "dinov2",
                    "backbone": "facebook/dinov2-base",
                    "backbone_weights": str(tmp_path / "none"),
                    "arch": {
                        "hidden_size": DIM,
                        "num_layers": 2,
                        "num_heads": 12,
                        "patch_size": 14,
                        "image_size": IMG,
                    },
                },
            },
        }
    )


def test_stage1_pipeline_equivalence(ref, tmp_path, monkeypatch):
    import torch
    from safetensors.torch import load_file as torch_load_file

    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.models.safetensors_io import save_decoder_checkpoint

    patch_cuda_to_cpu(monkeypatch)
    make_synthetic_dataset(str(tmp_path / "data" / "TINY"), n=5)

    # one backbone, two frameworks
    hf_model, our_backbone_params, _ = build_shared_backbone(
        hidden=DIM, layers=2, heads=12, patch=14, image=IMG, seed=0
    )
    monkeypatch.setattr(
        ref.feature_extractor, "build_feature_extractor", lambda cfg: hf_model
    )

    # one decoder checkpoint, two frameworks
    dec = confident_decoder_params(DIM, seed=0)
    dec_ema = confident_decoder_params(DIM, seed=1)
    ckpt = str(tmp_path / "decoder.safetensors")
    save_decoder_checkpoint(ckpt, dec, dec_ema)

    # --- reference oracle ---------------------------------------------------
    ref_cfg = _ref_cfg(ref, tmp_path)
    ref_loader = ref.dataloader_utils.DataLoaderFactory.create_test_loader(
        ref_cfg.dataset_cfg, logger=SilentLogger()
    )  # builds the shared feature cache on disk
    ref_model = ref.uscod.baseline(ref_cfg.model_cfg).eval()
    missing = ref_model.load_state_dict(torch_load_file(ckpt))
    assert not missing.missing_keys and not missing.unexpected_keys
    with torch.no_grad():
        ref_result = ref.loop_ucod.ValLoop_Look_Twice(
            ref_cfg, FakeRunner(ref_model, ref_loader)
        ).run()

    # --- ours ----------------------------------------------------------------
    cfg = _our_cfg(tmp_path)
    runner = Runner(cfg, mode="eval")
    # shared weights injected (the cache on disk is the reference's pickles)
    runner.feature_extractor.params = our_backbone_params
    runner.decoder_params = dec
    runner.decoder_ema_params = dec_ema
    assert runner.val_dataset.caches.get("features").mode == "r", (
        "our dataset must READ the reference-built cache, not rebuild it"
    )
    our_result = runner.launch_val_look_twice()

    # --- compare --------------------------------------------------------------
    assert set(our_result) == set(ref_result)
    for key in ref_result:
        assert np.isclose(our_result[key], ref_result[key], atol=2e-3), (
            key, our_result[key], ref_result[key],
        )

    # saved masks agree pixelwise (tiny tolerance for binarisation-boundary
    # float noise between torch and JAX)
    ref_preds = os.path.join(str(tmp_path / "ref_logs"), "preds", "TINY")
    our_preds = os.path.join(str(tmp_path / "our_logs"), "preds", "TINY")
    names = sorted(os.listdir(ref_preds))
    assert names == sorted(os.listdir(our_preds))
    for name in names:
        a = np.asarray(Image.open(os.path.join(ref_preds, name))) > 127
        b = np.asarray(Image.open(os.path.join(our_preds, name))) > 127
        assert a.shape == b.shape
        assert np.mean(a != b) < 0.01, (name, np.mean(a != b))


# ---------------------------------------------------------------------------
# Stage 2 (CORAL / UDLR eval)
# ---------------------------------------------------------------------------

WL = 14  # window_length: small keeps the CPU cross-attention cheap


def _ref_cfg_coral(ref, tmp_path):
    return ref.config.CfgNode(
        {
            "train_cfg": {"dist_train": False},
            "val_cfg": {},
            "model_cfg": {"dim": DIM, "feature_size": FEAT, "window_length": WL},
            "log_cfg": {"log_path": str(tmp_path / "ref_logs")},
            "dataset_cfg": {
                "dataset_dir": str(tmp_path / "data"),
                "cache_dir": str(tmp_path / "cache"),
                "feature_extractor_cfg": {
                    "type": "dinov2",
                    "backbone_type": "huggingface",
                    "backbone": "facebook/dinov2-base",
                    "backbone_weights": str(tmp_path / "none"),
                    "backbone_weight_base": str(tmp_path / "none"),
                },
                "valset_cfg": {
                    "DATASET": "TINY",
                    "image_size": (IMG, IMG),
                    "require_label": True,
                    "require_m_patches": True,
                    "use_cache": True,
                },
                "val_loader_cfg": {"batch_size": 1, "num_workers": 0},
            },
        }
    )


def _our_cfg_coral(tmp_path):
    cfg = _our_cfg(tmp_path)
    cfg.model_cfg.window_length = WL
    cfg.model_cfg.window_size = 3
    cfg.model_cfg.threshold = 0.0015
    cfg.dataset_cfg.valset_cfg.require_m_patches = True
    return cfg


def test_stage2_coral_pipeline_equivalence(ref, tmp_path, monkeypatch):
    import torch
    from safetensors.torch import load_file as torch_load_file

    from ucod_dpl_tpu.engine.runner import LocalRefineRunner
    from ucod_dpl_tpu.models.safetensors_io import save_decoder_checkpoint
    from ucod_dpl_tpu.models.udlr import init_sparse_refiner, save_refiner_checkpoint

    patch_cuda_to_cpu(monkeypatch)
    make_synthetic_dataset(str(tmp_path / "data" / "TINY"), n=3)

    hf_model, our_backbone_params, _ = build_shared_backbone(
        hidden=DIM, layers=2, heads=12, patch=14, image=IMG, seed=0
    )
    monkeypatch.setattr(
        ref.feature_extractor, "build_feature_extractor", lambda cfg: hf_model
    )

    dec = confident_decoder_params(DIM, seed=0)
    dec_ema = confident_decoder_params(DIM, seed=1)
    dec_ckpt = str(tmp_path / "decoder.safetensors")
    save_decoder_checkpoint(dec_ckpt, dec, dec_ema)

    import jax

    refiner_params = init_sparse_refiner(jax.random.PRNGKey(7), dim=DIM)
    refiner_ckpt = str(tmp_path / "refiner.safetensors")
    save_refiner_checkpoint(refiner_ckpt, refiner_params)

    # --- reference oracle ------------------------------------------------------
    ref_cfg = _ref_cfg_coral(ref, tmp_path)
    ref_loader = ref.dataloader_utils.DataLoaderFactory.create_lr_test_loader(
        ref_cfg.dataset_cfg, logger=SilentLogger(), window_size=3
    )  # builds feature/patch/m_patch caches on disk
    ref_model = ref.uscod.baseline(ref_cfg.model_cfg).eval()
    res = ref_model.load_state_dict(torch_load_file(dec_ckpt))
    assert not res.missing_keys and not res.unexpected_keys
    ref_refiner = ref.UDLR.SparseRefiner(
        config=None, window_size=3, threshold=0.0015, dim=DIM
    ).eval()
    res = ref_refiner.load_state_dict(torch_load_file(refiner_ckpt))
    assert not res.missing_keys and not res.unexpected_keys

    with torch.no_grad():
        ref_result = ref.loop_coral.LocalRefineValidationLoop(
            ref_cfg, FakeRunner(ref_model, ref_loader, refiner=ref_refiner)
        ).run()

    # --- ours --------------------------------------------------------------------
    cfg = _our_cfg_coral(tmp_path)
    runner = LocalRefineRunner(cfg, mode="val")
    runner.feature_extractor.params = our_backbone_params
    runner.decoder_params = dec
    runner.decoder_ema_params = dec_ema
    runner.refiner_params = refiner_params
    for kind in ("features", "patch", "m_patch"):
        assert runner.val_dataset.caches.get(kind).mode == "r", kind
    our_result = runner.launch_val()

    assert set(our_result) == set(ref_result)
    for key in ref_result:
        assert np.isclose(our_result[key], ref_result[key], atol=2e-3), (
            key, our_result[key], ref_result[key],
        )
