"""Serving API: load-once predict-many, mixed input types, batch bucketing."""

import numpy as np
import pytest
from PIL import Image

import jax

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.data.feature_extractor import FeatureExtractor
from ucod_dpl_tpu.models.dba import init_rev_decoder
from ucod_dpl_tpu.serving import Predictor

DIM = 64


@pytest.fixture(scope="module")
def predictor():
    fe = FeatureExtractor(
        CfgNode(
            {
                "type": "dinov2",
                "backbone": "facebook/dinov2-base",
                "backbone_weights": "none",
                "arch": {
                    "hidden_size": DIM,
                    "num_layers": 2,
                    "num_heads": 4,
                    "patch_size": 14,
                    "image_size": 56,
                },
            }
        )
    )
    decoder = init_rev_decoder(jax.random.PRNGKey(0), DIM)
    return Predictor(fe, decoder, image_size=(56, 56), feature_size=8, max_batch=4)


def test_predict_paths_and_arrays(predictor, tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "x.jpg"
    Image.fromarray((rng.random((80, 100, 3)) * 255).astype(np.uint8)).save(path)
    raw = (rng.random((64, 72, 3)) * 255).astype(np.uint8)

    masks = predictor.predict([str(path), raw])
    assert len(masks) == 2
    for m in masks:
        assert m.shape == (56, 56)
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_predict_batching_consistency(predictor, tmp_path):
    """Results must not depend on how inputs are batched/bucketed."""
    rng = np.random.default_rng(1)
    images = [(rng.random((50, 60, 3)) * 255).astype(np.uint8) for _ in range(5)]
    singly = [predictor.predict([im])[0] for im in images]
    batched = predictor.predict(images)  # 5 inputs across buckets (4 + 1)
    for a, b in zip(singly, batched):
        np.testing.assert_array_equal(a, b)


def test_predict_output_size(predictor):
    rng = np.random.default_rng(2)
    raw = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
    (mask,) = predictor.predict([raw], output_size=(64, 72))
    assert mask.shape == (64, 72)


def test_predict_soft_masks(predictor):
    rng = np.random.default_rng(3)
    raw = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
    (soft,) = predictor.predict([raw], soft=True)
    assert soft.shape == (56, 56)
    assert soft.min() >= 0.0 and soft.max() <= 1.0
    assert len(np.unique(soft)) > 2  # actual probabilities, not a binary mask
    (hard,) = predictor.predict([raw])
    np.testing.assert_array_equal(hard, (soft > 0.5).astype(np.float32))


def test_predict_look_twice(predictor, tmp_path):
    """look_twice refines small components via crop re-inference; paths and
    uint8 arrays carry the original image, pre-normalised arrays refuse."""
    rng = np.random.default_rng(4)
    path = tmp_path / "lt.jpg"
    Image.fromarray((rng.random((90, 110, 3)) * 255).astype(np.uint8)).save(path)

    predictor.look_twice_th = 0.95  # force the zoom-in path
    masks = predictor.predict([str(path)], look_twice=True)
    assert masks[0].shape == (56, 56)
    assert np.all((masks[0] >= 0.0) & (masks[0] <= 1.0))

    with pytest.raises(ValueError):
        predictor.predict([np.zeros((56, 56, 3), np.float32)], look_twice=True)
    with pytest.raises(ValueError):
        predictor.predict([str(path)], look_twice=True, soft=True)


def test_strict_weight_loading(tmp_path):
    cfg = CfgNode(
        {
            "type": "dinov2",
            "backbone": "facebook/dinov2-base",
            "backbone_weights": str(tmp_path / "nonexistent"),
            "arch": {"hidden_size": DIM, "num_layers": 1, "num_heads": 4,
                     "patch_size": 14, "image_size": 56},
        }
    )
    with pytest.raises(FileNotFoundError):
        FeatureExtractor(cfg, strict=True)
    cfg.strict_weights = True  # config-driven strictness
    with pytest.raises(FileNotFoundError):
        FeatureExtractor(cfg)
    cfg.strict_weights = False
    FeatureExtractor(cfg)  # non-strict: random init with a warning


def test_predict_single_inputs_wrapped(predictor, tmp_path):
    """A bare path or single (H, W, 3) image is ONE input — iterating a
    string's characters or an image's rows would silently return garbage."""
    rng = np.random.default_rng(3)
    path = tmp_path / "one.jpg"
    Image.fromarray((rng.random((60, 70, 3)) * 255).astype(np.uint8)).save(path)
    assert len(predictor.predict(str(path))) == 1
    img = (rng.random((60, 70, 3)) * 255).astype(np.uint8)
    assert len(predictor.predict(img)) == 1
    stack = (rng.random((3, 60, 70, 3)) * 255).astype(np.uint8)
    assert len(predictor.predict(stack)) == 3


def test_predict_rejects_malformed_arrays(predictor):
    rng = np.random.default_rng(4)
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        predictor.predict(rng.random((60, 70)).astype(np.float32))
    # a pre-normalised float array must match the model's image_size —
    # silently broadcasting a wrong shape into the batch is the failure
    # mode this guards
    with pytest.raises(ValueError, match="expected a path"):
        predictor.predict([rng.random((60, 70, 3)).astype(np.float32)])


def test_predict_loads_lazily_per_chunk(predictor, tmp_path, monkeypatch):
    """Inputs must be decoded per device batch, not all upfront (a 10k-image
    call would otherwise hold every original + array in memory at once)."""
    import ucod_dpl_tpu.serving as S

    rng = np.random.default_rng(5)
    paths = []
    for i in range(10):  # max_batch=4 -> 3 chunks
        p = tmp_path / f"lazy{i}.jpg"
        Image.fromarray((rng.random((40, 50, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    high_water = {"live": 0, "max_live": 0}
    orig_load = Predictor._load

    class TrackedImage:
        pass

    def tracked_load(self, item):
        arr, img = orig_load(self, item)
        high_water["live"] += 1
        high_water["max_live"] = max(high_water["max_live"], high_water["live"])
        return arr, img

    monkeypatch.setattr(Predictor, "_load", tracked_load)
    calls_before_first_batch = []
    orig_bucket = Predictor._bucket

    def tracked_bucket(self, n):
        # _bucket runs once per chunk AFTER that chunk's loads: record how
        # many loads have happened by the first chunk's device call
        calls_before_first_batch.append(high_water["live"])
        high_water["live"] = 0
        return orig_bucket(self, n)

    monkeypatch.setattr(Predictor, "_bucket", tracked_bucket)
    masks = predictor.predict(paths)
    assert len(masks) == 10
    # first chunk dispatched after loading only its own 4 inputs
    assert calls_before_first_batch[0] == 4, calls_before_first_batch
