"""Golden-value tests for LookTwice bbox arithmetic
(expand_bbox / resize_bbox / process_preds gating, loop_UCOD_DPL.py:354-417).
"""

import math
import os

import numpy as np

from ucod_dpl_tpu.engine.eval_loop import expand_bbox, resize_bbox, _bucket


def test_resize_bbox_golden():
    # 518-space bbox into a 1036x777 original: scale (2.0, 1.5)
    assert resize_bbox([100, 60, 50, 40], 518, 518, 1036, 777) == [200, 90, 100, 60]
    # int truncation semantics
    assert resize_bbox([3, 3, 3, 3], 10, 10, 15, 15) == [4, 4, 4, 4]


def test_expand_bbox_const():
    mask = np.zeros((100, 100), np.uint8)
    out = expand_bbox(mask, (40, 40, 20, 20), 100, 100, expand_type="const", scale=1.3)
    # grows by 30%, centred: new size 26, offset shifts by 3
    assert out == [37, 37, 26, 26]


def test_expand_bbox_clamps_to_image():
    mask = np.zeros((100, 100), np.uint8)
    out = expand_bbox(mask, (0, 0, 20, 20), 100, 100, expand_type="const", scale=2.0)
    assert out[0] == 0 and out[1] == 0 and out[2] == 40
    out2 = expand_bbox(mask, (85, 85, 15, 15), 100, 100, expand_type="const", scale=2.0)
    # right/bottom clamp pulls origin back so the box fits
    assert out2[0] + out2[2] <= 100 and out2[1] + out2[3] <= 100


def test_expand_bbox_dynamic_formula():
    """dynamic scale = sqrt(1 - br/fr + 1) with fr = in-box fill ratio and
    br = h*y / (H*W) (the reference's exact expression)."""
    mask = np.zeros((100, 100), np.float64)
    x, y, w, h = 30, 20, 10, 10
    mask[y : y + h, x : x + w] = 1.0  # fr = 1
    fr = 1.0
    br = (h * y) / (100 * 100)
    scale = math.sqrt(1 - br / fr + 1)
    out = expand_bbox(mask, (x, y, w, h), 100, 100, expand_type="dynamic")
    assert out[2] == int(w * scale)
    assert out[3] == int(h * scale)


def test_expand_bbox_dynamic_degenerate_guarded():
    """br/fr > 2 would crash the reference's math.sqrt; we clamp at 0."""
    mask = np.zeros((100, 100), np.float64)
    x, y, w, h = 10, 90, 10, 8
    mask[y : y + h, x : x + w] = 0.0
    mask[y, x] = 1.0  # fr = 1/80, br = 8*90/10000 = .072 -> br/fr = 5.76
    out = expand_bbox(mask, (x, y, w, h), 100, 100, expand_type="dynamic")
    assert out[2] == 0 and out[3] == 0  # sqrt(max(...,0)) = 0 -> empty box


def test_look_twice_empty_bboxes_noop(tmp_path):
    """All components under the 0.01 area filter -> mask returned unchanged
    (regression: used to crash on crops[0])."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_eval_e2e import _make_synthetic_dataset, _tiny_cfg
    from ucod_dpl_tpu.engine import Runner
    from ucod_dpl_tpu.engine.eval_loop import LookTwiceEvaluator

    _make_synthetic_dataset(tmp_path / "RefCOD", n=1)
    cfg = _tiny_cfg(tmp_path)
    runner = Runner(cfg, mode="eval")
    ev = LookTwiceEvaluator(cfg, runner)
    mask = np.zeros((56, 56), np.float32)
    out = ev.look_twice("unused", [], mask)
    np.testing.assert_array_equal(out, mask)


def test_crop_buckets():
    # coarse buckets: each distinct size is a full-backbone XLA compile
    assert _bucket(1) == 4
    assert _bucket(3) == 4
    assert _bucket(9) == 16
    assert _bucket(17) == 32
