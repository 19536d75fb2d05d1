"""End-to-end stage-1 eval on a synthetic dataset with a tiny random DINO.

Exercises: directory scan, batched feature-cache build + reread, decoder
forward, LookTwice connected-components / bbox expansion / batched crop
re-inference, metric accumulation, and PNG mask output.
"""

import os

import numpy as np
import pytest
from PIL import Image

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.engine import Runner

pytestmark = pytest.mark.heavy  # multi-process / e2e: excluded from the quick loop

DIM = 64


def _make_synthetic_dataset(root, n=3, size=(80, 100)):
    im = root / "TINY" / "im"
    gt = root / "TINY" / "gt"
    im.mkdir(parents=True)
    gt.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = (rng.random((*size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(im / f"img{i}.jpg")
        mask = np.zeros(size, dtype=np.uint8)
        mask[20 + i : 40 + i, 30 : 60] = 255
        Image.fromarray(mask).save(gt / f"img{i}.png")


def _tiny_cfg(tmp_path):
    return CfgNode(
        {
            "work_dir": str(tmp_path / "work"),
            "mode": "eval",
            "seed": 42,
            "model_cfg": {"dim": DIM, "feature_size": 8, "dis_use_features": False,
                          "ema_weight": 0.99},
            "val_cfg": {
                "look_twice": True,
                "look_twice_th": 0.95,  # force the crop path
                "expand_type": "dynamic",
                "enable_val": True,
            },
            "log_cfg": {"log_path": str(tmp_path / "logs"), "multi_rank": [0]},
            "tpu_cfg": {"mesh": {"data": -1, "model": 1}},
            "dataset_cfg": {
                "dataset_dir": str(tmp_path / "RefCOD"),
                "cache_dir": str(tmp_path / "cache"),
                "valset_cfg": {
                    "DATASET": "TINY",
                    "require_label": True,
                    "image_size": (56, 56),
                    "keep_size": True,
                },
                "trainset_cfg": {
                    "DATASET": "TINY",
                    "require_label": False,
                    "image_size": (56, 56),
                    "bkg_th": 0.6,
                },
                "val_loader_cfg": {"batch_size": 1},
                "trainloader_cfg": {"batch_size": 2, "shuffle": True},
                "feature_extractor_cfg": {
                    "type": "dinov2",
                    "backbone": "facebook/dinov2-base",
                    "backbone_weights": str(tmp_path / "nonexistent"),
                    "arch": {
                        "hidden_size": DIM,
                        "num_layers": 2,
                        "num_heads": 4,
                        "patch_size": 14,
                        "image_size": 56,
                    },
                },
            },
        }
    )


def test_eval_end_to_end(tmp_path):
    _make_synthetic_dataset(tmp_path / "RefCOD")
    cfg = _tiny_cfg(tmp_path)

    runner = Runner(cfg, mode="eval")
    result = runner.launch_val_look_twice()

    for key in ["SMeasure", "MAE", "E_MAX", "F_MEAN", "WFM"]:
        assert key in result
        assert np.isfinite(result[key])
    assert 0.0 <= result["MAE"] <= 1.0

    # masks written at label resolution
    preds_dir = os.path.join(cfg.log_cfg.log_path, "preds", "TINY")
    files = sorted(os.listdir(preds_dir))
    assert files == ["img0.png", "img1.png", "img2.png"]
    mask = np.array(Image.open(os.path.join(preds_dir, files[0])))
    assert mask.shape == (80, 100)

    # feature cache written once, reread on second construction
    feat_dir = os.path.join(
        str(tmp_path / "cache"), "features_cache", "dinov2", "test", "TINY"
    )
    assert os.path.exists(os.path.join(feat_dir, "index.json"))
    runner2 = Runner(cfg, mode="eval")
    assert runner2.val_dataset.caches.get("features").mode == "r"
    result2 = runner2.launch_val_look_twice()
    assert np.isclose(result["MAE"], result2["MAE"])  # deterministic


def test_runner_load_latest_checkpoint(tmp_path):
    """save_checkpoint -> load_latest_checkpoint roundtrip: the newest
    epoch file wins and the decoder params are restored exactly."""
    import time

    import jax

    _make_synthetic_dataset(tmp_path / "RefCOD")
    runner = Runner(_tiny_cfg(tmp_path), mode="eval")

    runner.save_checkpoint(1)
    time.sleep(0.05)  # distinct mtimes: discovery is newest-by-mtime
    saved = jax.tree.map(np.asarray, runner.decoder_params)
    p2 = runner.save_checkpoint(2)

    # perturb in-memory params, then restore
    runner.decoder_params = jax.tree.map(lambda a: a + 1.0, runner.decoder_params)
    loaded_path = runner.load_latest_checkpoint()
    assert loaded_path == p2
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(runner.decoder_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # empty dir -> None, params untouched
    empty = Runner(_tiny_cfg(tmp_path), mode="eval")
    for f in os.listdir(empty.ckp_dir):
        os.unlink(os.path.join(empty.ckp_dir, f))
    assert empty.load_latest_checkpoint() is None


def test_eval_batched_matches_bs1(tmp_path):
    """Batched first pass must reproduce the bs=1 metrics exactly."""
    _make_synthetic_dataset(tmp_path / "RefCOD")
    cfg = _tiny_cfg(tmp_path)
    r1 = Runner(cfg, mode="eval").launch_val_look_twice()
    cfg.dataset_cfg.val_loader_cfg.batch_size = 3
    r2 = Runner(cfg, mode="eval").launch_val_look_twice()
    for k in ("MAE", "SMeasure", "E_MEAN", "F_MEAN", "WFM"):
        assert np.isclose(r1[k], r2[k]), (k, r1[k], r2[k])


def test_eval_without_look_twice(tmp_path):
    _make_synthetic_dataset(tmp_path / "RefCOD")
    cfg = _tiny_cfg(tmp_path)
    cfg.val_cfg.look_twice = False
    runner = Runner(cfg, mode="eval")
    result = runner.launch_val_look_twice()
    assert np.isfinite(result["SMeasure"])
