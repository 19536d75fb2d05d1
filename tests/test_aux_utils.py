"""Auxiliary subsystem tests: bilateral solver, offline metrics, AUROC,
visualization, profiling hooks, connected components vs cv2."""

import os

import numpy as np
import pytest

from ucod_dpl_tpu.utils.bilateral_solver import (
    BilateralGrid,
    apply_bilateral_solver,
    bbox_from_mask,
)
from ucod_dpl_tpu.utils.components import bounding_rect, connected_components
from ucod_dpl_tpu.utils.metrics import auroc, calculate_cod_metrics


def _edge_image(h=48, w=48):
    """Image with a sharp color edge at column w//2."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = [200, 40, 40]
    img[:, w // 2 :] = [30, 30, 180]
    return img


def test_bilateral_grid_filter_preserves_constants():
    img = _edge_image()
    grid = BilateralGrid(img, sigma_spatial=8, sigma_luma=4, sigma_chroma=4)
    const = np.ones(img.shape[0] * img.shape[1])
    out = grid.filter(const)
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_bilateral_solver_snaps_mask_to_edge():
    """A ragged blob mask should snap to the blob's color edge.  (A blob, not
    a half-plane: the reference's connected-component selection keeps the
    second-largest region — i.e. the foreground object under a larger
    background — which is degenerate when fg and bg have equal area.)"""
    h, w = 48, 64
    img = np.full((h, w, 3), 40, np.uint8)
    img[12:36, 20:44] = 200  # bright rectangle on dark background
    rng = np.random.default_rng(0)
    mask = np.zeros((h, w), np.float32)
    mask[12:36, 20:44] = 1.0
    jitter = rng.integers(-3, 4, size=24)
    for k, i in enumerate(range(12, 36)):  # ragged right boundary
        mask[i, 44 - 3 : 44 + jitter[k]] = jitter[k] > 0
    refined, accepted = apply_bilateral_solver(mask, img)
    assert accepted
    target = np.zeros_like(mask)
    target[12:36, 20:44] = 1.0
    err_in = np.abs(mask - target).sum()
    err_out = np.abs(refined - target).sum()
    assert err_out <= err_in


def test_bbox_iou_and_batch_solver():
    from ucod_dpl_tpu.utils.bilateral_solver import batch_apply_bilateral_solver, bbox_iou

    assert bbox_iou((0, 0, 9, 9), (0, 0, 9, 9)) == 1.0
    assert bbox_iou((0, 0, 9, 9), (10, 10, 19, 19)) == 0.0
    v = bbox_iou((0, 0, 9, 9), (5, 0, 14, 9))
    assert np.isclose(v, 50 / 150)

    img = _edge_image()
    mask = np.zeros(img.shape[:2], np.float32)
    mask[:, : img.shape[1] // 2] = 1.0
    outs = batch_apply_bilateral_solver([mask, mask], [img, img])
    assert len(outs) == 2 and outs[0].shape == mask.shape


def test_bbox_from_mask_largest_component():
    mask = np.zeros((20, 20))
    mask[2:5, 2:5] = 1  # area 9
    mask[10:18, 10:18] = 1  # area 64 (largest)
    x0, y0, x1, y1 = bbox_from_mask(mask)
    assert (x0, y0, x1, y1) == (10, 10, 17, 17)


def test_connected_components_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    for _ in range(5):
        mask = (rng.random((32, 32)) > 0.7).astype(np.uint8)
        n_ours, labels_ours = connected_components(mask)
        n_cv, labels_cv = cv2.connectedComponents(mask * 255, connectivity=8)
        assert n_ours == n_cv - 1  # cv2 counts background
        # identical partitions up to relabeling
        for i in range(1, n_ours + 1):
            comp = labels_ours == i
            cv_ids = np.unique(labels_cv[comp])
            assert len(cv_ids) == 1 and cv_ids[0] != 0
        # bounding rects agree with cv2 for each component
        for i in range(1, n_ours + 1):
            comp = (labels_ours == i).astype(np.uint8)
            assert bounding_rect(comp) == tuple(cv2.boundingRect(comp))


def test_auroc_perfect_and_random():
    gt = np.zeros((10, 10))
    gt[3:7, 3:7] = 1
    assert auroc(gt, gt) == 1.0
    rng = np.random.default_rng(0)
    val = auroc(rng.random((50, 50)), (rng.random((50, 50)) > 0.5))
    assert 0.3 < val < 0.7


def test_calculate_cod_metrics_dirs(tmp_path):
    from PIL import Image

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    for i in range(3):
        m = np.zeros((40, 50), np.uint8)
        m[10:30, 15:35] = 255
        Image.fromarray(m).save(gt_dir / f"x{i}.png")
        # predictions at a different resolution (resize path)
        p = np.zeros((20, 25), np.uint8)
        p[5:15, 8:18] = 255
        Image.fromarray(p).save(pred_dir / f"x{i}.png")
    res = calculate_cod_metrics(str(gt_dir), str(pred_dir), verbose=False)
    assert res["SMeasure"] > 0.8
    assert res["MAE"] < 0.1


def test_visualize_bboxes(tmp_path):
    from ucod_dpl_tpu.utils.visualize import draw_bboxes_on_image_and_save

    img = _edge_image()
    out = tmp_path / "viz.png"
    draw_bboxes_on_image_and_save(img, [[4, 4, 10, 10]], str(out), mask=img[:, :, 0] > 100)
    # matplotlib optional; if present the file must exist
    try:
        import matplotlib  # noqa: F401

        assert out.exists()
    except ImportError:
        pass


def test_profiling_hooks(tmp_path):
    import jax.numpy as jnp

    from ucod_dpl_tpu.utils.profiling import annotate, maybe_profile

    with maybe_profile(False, str(tmp_path)):
        pass  # disabled path is a no-op
    with annotate("test-region"):
        _ = jnp.ones(4).sum()


def test_bilateral_solver_numeric_parity_vs_reference():
    """Our solver must reproduce the reference's bilateral_solver_output
    (soft solution AND CC-selected binary) on a structured image — including
    the post-loop m = n*blur(n) bistochastization correction
    (reference bilateral_solver.py:114-117)."""
    import importlib.util
    import os

    import pytest

    from conftest import REFERENCE_ROOT, reference_available
    from ucod_dpl_tpu.utils.bilateral_solver import bilateral_solver_output

    if not reference_available():
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location(
        "ref_bilateral", os.path.join(REFERENCE_ROOT, "engine/utils/bilateral_solver.py")
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    # environment shim: this image's scipy renamed cg(tol=) to cg(rtol=)
    import scipy.sparse.linalg as sla

    ref.cg = lambda A, b, x0=None, M=None, maxiter=None, tol=None: sla.cg(
        A, b, x0=x0, M=M, maxiter=maxiter, rtol=tol
    )

    rng = np.random.default_rng(0)
    h, w = 48, 56
    yy, xx = np.mgrid[:h, :w]
    blob = ((yy - 22) ** 2 + (xx - 30) ** 2) < 144
    img = (
        np.stack([xx / w, yy / h, np.zeros_like(xx)], axis=-1) * 120
        + blob[..., None] * 100
        + rng.random((h, w, 3)) * 10
    ).astype(np.uint8)
    # noisy target: blob plus a spurious blotch the CC selection should drop
    target = blob.astype(np.float64).copy()
    target[5:9, 5:9] = 1.0

    ref_soft, ref_binary = ref.bilateral_solver_output(
        None, target, img=img, sigma_spatial=8, sigma_luma=4, sigma_chroma=4
    )
    our_soft, our_binary = bilateral_solver_output(
        img, target, sigma_spatial=8, sigma_luma=4, sigma_chroma=4
    )
    np.testing.assert_allclose(our_soft, ref_soft, atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(our_binary, ref_binary)

    # get_all_cc variant too
    _, ref_all = ref.bilateral_solver_output(
        None, target, img=img, sigma_spatial=8, sigma_luma=4, sigma_chroma=4,
        get_all_cc=True,
    )
    _, our_all = bilateral_solver_output(
        img, target, sigma_spatial=8, sigma_luma=4, sigma_chroma=4, get_all_cc=True
    )
    np.testing.assert_array_equal(our_all, ref_all)


def test_logger_singleton_attaches_later_log_file(tmp_path):
    """An early bare get_logger() (FeatureExtractor, datasets) must not
    block the Runner's later file-logging request — the singleton attaches
    a newly requested log_file instead of silently dropping it."""
    from ucod_dpl_tpu.utils.logger import Logger

    name = "ucod_test_upgrade"
    first = Logger(name)  # console-only, like an early component
    log_path = tmp_path / "run.log"
    second = Logger(name, log_file=str(log_path))
    assert first is second
    second.log("hello file")
    import logging

    for h in logging.getLogger(name).handlers:
        h.flush()
    assert log_path.exists() and "hello file" in log_path.read_text()
    # same path requested again: no duplicate handler
    Logger(name, log_file=str(log_path)).log("once")
    for h in logging.getLogger(name).handlers:
        h.flush()
    assert log_path.read_text().count("once") == 1
