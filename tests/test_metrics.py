"""Metric parity tests.

The reference's metric implementations (mounted read-only at
/root/reference) are imported at test time as the golden oracle; our
implementations must agree to float64 precision on random masks.
"""

import os
import sys

import numpy as np
import pytest

from ucod_dpl_tpu.utils import metrics as M

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_metrics():
    sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    mod = importlib.import_module("engine.utils.metrics.metric")
    yield mod
    sys.path.remove(REFERENCE_ROOT)


def _random_cases(seed=0, n=6):
    rng = np.random.default_rng(seed)
    cases = []
    for i in range(n):
        h, w = rng.integers(33, 97, size=2)
        gt = (rng.random((h, w)) > 0.6).astype(np.float64) * 255
        # mix of soft and binarized predictions
        if i % 2 == 0:
            pred = rng.random((h, w)) * 255
        else:
            pred = (rng.random((h, w)) > 0.5).astype(np.float64) * 255
        cases.append((pred, gt))
    # degenerate cases
    h = w = 48
    cases.append((np.zeros((h, w)), np.zeros((h, w))))  # empty gt, empty pred
    cases.append((np.ones((h, w)) * 255, np.zeros((h, w))))  # empty gt, full pred
    cases.append((np.zeros((h, w)), np.ones((h, w)) * 255))  # full gt, empty pred
    blob = np.zeros((h, w))
    blob[10:20, 12:30] = 255
    cases.append((blob, blob))  # exact match
    return cases


def test_statistics_parity(ref_metrics):
    ours = M.CODStatistics()
    theirs = ref_metrics.statistics()
    import torch

    for pred, gt in _random_cases():
        ours.step(gt[None], pred[None])
        theirs.step(torch.from_numpy(gt[None]), torch.from_numpy(pred[None]))

    r_ours = ours.get_result()
    r_theirs = theirs.get_result()
    for key in ["MAE", "SMeasure", "WFM", "E_MAX", "E_MEAN", "F_MAX", "F_MEAN", "ACC", "mIOU"]:
        assert np.isclose(r_ours[key], r_theirs[key], rtol=1e-10, atol=1e-12), (
            key,
            r_ours[key],
            r_theirs[key],
        )


def test_parallel_workers_match_sync():
    sync = M.CODStatistics(workers=0)
    par = M.CODStatistics(workers=2)
    for pred, gt in _random_cases(seed=5, n=4):
        sync.step(gt[None], pred[None])
        par.step(gt[None], pred[None])
    rs, rp = sync.get_result(), par.get_result()
    for k, v in rs.items():
        assert np.isclose(v, rp[k]), (k, v, rp[k])


def test_individual_metrics_parity(ref_metrics):
    rng = np.random.default_rng(42)
    for _ in range(4):
        h, w = rng.integers(40, 80, size=2)
        gt_raw = (rng.random((h, w)) > 0.55).astype(np.float64) * 255
        pred_raw = rng.random((h, w)) * 255

        pred, gt = M.normalize_pair(pred_raw, gt_raw)
        ref_pred, ref_gt = ref_metrics._prepare_data(gt=gt_raw, pred=pred_raw)
        np.testing.assert_allclose(pred, ref_pred)
        np.testing.assert_array_equal(gt, ref_gt)

        sm_ref = ref_metrics.Smeasure()
        sm_ref.step(pred=pred_raw, gt=gt_raw)
        assert np.isclose(M.s_measure(pred, gt), sm_ref.get_results()["sm"])

        wfm_ref = ref_metrics.WeightedFmeasure()
        wfm_ref.step(pred=pred_raw, gt=gt_raw)
        assert np.isclose(M.weighted_f_measure(pred, gt), wfm_ref.get_results()["wfm"])

        em_ref = ref_metrics.Emeasure()
        curve_ref, adp_ref = em_ref.step(pred=pred_raw, gt=gt_raw)
        adp, curve = M.e_measure(pred, gt)
        assert np.isclose(adp, adp_ref)
        np.testing.assert_allclose(curve, curve_ref, rtol=1e-10)

        fm_ref = ref_metrics.Fmeasure()
        fm_ref.step(pred=pred_raw, gt=gt_raw)
        res = fm_ref.get_results()["fm"]
        adp_f, curve_f, _, _ = M.f_measure(pred, gt)
        assert np.isclose(adp_f, res["adp"])
        np.testing.assert_allclose(curve_f, res["curve"], rtol=1e-10)


def test_native_scorer_parity():
    """The C++ scorer (native/metrics_kernel.cpp) must reproduce the NumPy
    protocol bundle at float64 precision — including EDT tie-breaking
    (checkerboard), the constant-pred integer-cast quirk, and degenerate
    masks."""
    import pytest

    from ucod_dpl_tpu.utils.metrics import (
        _gauss_kernel_matlab,
        _score_one,
        normalize_pair,
    )
    from ucod_dpl_tpu.utils.native import score_one_native

    K = _gauss_kernel_matlab()
    rng = np.random.default_rng(11)

    def one_case(g, p):
        pn, gn = normalize_pair(p, g)
        native = score_one_native(pn, gn, K)  # dtype carries the int quirk
        if native is None:
            pytest.skip("no compiler: native metrics unavailable")
        import os

        os.environ["UCOD_NATIVE_METRICS"] = "0"
        try:
            ref = _score_one((g, p))
        finally:
            os.environ.pop("UCOD_NATIVE_METRICS", None)
        for i in range(5):
            a, b = ref[i], native[i]
            assert np.isclose(a, b, rtol=1e-9, atol=1e-12) or (
                np.isnan(a) and np.isnan(b)
            ), (i, a, b)
        np.testing.assert_allclose(native[5], ref[5], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(native[6], ref[6], rtol=1e-9, atol=1e-12)

    for _ in range(3):  # random soft preds
        h, w = int(rng.integers(30, 150)), int(rng.integers(30, 150))
        one_case((rng.random((h, w)) > 0.7).astype(float) * 255, rng.random((h, w)) * 255)
    yy, xx = np.mgrid[:64, :80]  # tie-heavy EDT
    one_case((((yy // 8) + (xx // 8)) % 2).astype(float) * 255, rng.random((64, 80)))
    g = np.zeros((50, 60)); g[20:30, 20:40] = 255
    one_case(g, np.full((50, 60), 255.0))  # constant-pred int-cast quirk
    one_case(g, np.zeros((50, 60)))
    one_case(np.zeros((50, 60)), rng.random((50, 60)))  # empty gt
    one_case(np.full((50, 60), 255.0), rng.random((50, 60)))  # full gt
    g = np.zeros((50, 60)); g[25, 30] = 255
    one_case(g, rng.random((50, 60)))  # single-pixel gt (ddof=1 nan path)
