"""LRDataset patch geometry: grid ordering and m-patch slice coordinates
(golden values from the reference's loops, lr_dataset.py:136-168)."""

import numpy as np
import pytest
from PIL import Image

from ucod_dpl_tpu.config import CfgNode
from ucod_dpl_tpu.data.dataset import LRDataset

from test_eval_e2e import DIM, _make_synthetic_dataset, _tiny_cfg


@pytest.fixture()
def lr_dataset(tmp_path):
    _make_synthetic_dataset(tmp_path / "RefCOD", n=1)
    cfg = _tiny_cfg(tmp_path)
    ds = LRDataset(
        cfg.dataset_cfg.valset_cfg,
        cfg.dataset_cfg.feature_extractor_cfg,
        dataset_dir=cfg.dataset_cfg.dataset_dir,
        cache_dir=cfg.dataset_cfg.cache_dir,
        mode="val",
        image_size=(56, 56),
        require_label=True,
        window_size=3,
        require_m_patches=False,
    )
    return ds


def test_grid_patch_count_and_order(lr_dataset):
    """window_size^2 patches, row-major (i outer, j inner) as the reference
    (lr_dataset.py:136-150).  The vectorised `_grid_patch_arrays` must slice
    patch k from grid cell (k // ws, k % ws) of the resized image — checked
    against explicit PIL crop boxes on a distinct-per-cell image."""
    from ucod_dpl_tpu.data.transforms import patch_transform

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (80, 100, 3), dtype=np.uint8))
    patches = lr_dataset._grid_patch_arrays(img)
    assert patches.shape == (9, 56, 56, 3)
    big = img.resize((168, 168), Image.BILINEAR)
    for k, box in enumerate(
        [(j * 56, i * 56, (j + 1) * 56, (i + 1) * 56) for i in range(3) for j in range(3)]
    ):
        ref = patch_transform(big.crop(box))
        np.testing.assert_array_equal(patches[k], ref)


def test_m_patch_slices_are_36px_stride_18():
    """2x2 overlapping 36px slices at stride 18 of the high-res key map."""
    from ucod_dpl_tpu.data.dataset import LRDataset as LD

    s, st = LD.M_PATCH_SLICE, LD.M_PATCH_STRIDE
    assert (s, st) == (36, 18)
    # on a 54x54 map the four windows tile [0:36],[18:54] in each axis
    key = np.arange(54 * 54).reshape(54, 54)
    windows = []
    for i in range(2):
        for j in range(2):
            windows.append(key[i * st : i * st + s, j * st : j * st + s])
    assert windows[0][0, 0] == key[0, 0]
    assert windows[1][0, 0] == key[0, 18]
    assert windows[2][0, 0] == key[18, 0]
    assert windows[3][-1, -1] == key[53, 53]


def test_center_crop_halves_image(lr_dataset):
    from ucod_dpl_tpu.utils.fileio import ImageIO

    path = lr_dataset.image_paths[0]
    img = ImageIO.read_image(path, "RGB")
    w, h = img.size
    cropped = img.crop((w // 4, h // 4, w // 4 + w // 2, h // 4 + h // 2))
    assert cropped.size == (w // 2, h // 2)
