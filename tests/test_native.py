"""Native C++ connected-components runtime: correctness vs scipy/cv2."""

import numpy as np
import pytest
from scipy import ndimage

from ucod_dpl_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_labels_match_scipy_partition(lib):
    rng = np.random.default_rng(0)
    for _ in range(8):
        mask = (rng.random((64, 64)) > 0.6).astype(np.uint8)
        n_nat, lab_nat = native.cc_label(mask)
        lab_sp, n_sp = ndimage.label(mask, structure=np.ones((3, 3)))
        assert n_nat == n_sp
        # identical partitions up to relabeling
        for i in range(1, n_nat + 1):
            comp = lab_nat == i
            ids = np.unique(lab_sp[comp])
            assert len(ids) == 1 and ids[0] != 0
        # background agrees exactly
        np.testing.assert_array_equal(lab_nat == 0, lab_sp == 0)


def test_native_stats(lib):
    mask = np.zeros((32, 32), np.uint8)
    mask[2:6, 3:9] = 1  # area 24, bbox (3,2)-(8,5)
    mask[20:25, 20:22] = 1  # area 10, bbox (20,20)-(21,24)
    n, labels = native.cc_label(mask)
    assert n == 2
    stats = native.cc_stats(labels, n)
    stats_sorted = sorted(stats.tolist(), key=lambda s: -s[0])
    assert stats_sorted[0] == [24, 3, 2, 8, 5]
    assert stats_sorted[1] == [10, 20, 20, 21, 24]


def test_native_worst_case_labels(lib):
    # checkerboard: every 1-pixel is 8-connected diagonally -> one component
    mask = np.indices((33, 33)).sum(axis=0) % 2
    n, _ = native.cc_label(mask.astype(np.uint8))
    assert n == 1
    # stripes: w/2 separate columns
    stripes = np.zeros((16, 16), np.uint8)
    stripes[:, ::2] = 1
    n2, _ = native.cc_label(stripes)
    assert n2 == 8
