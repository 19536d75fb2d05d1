import json

import numpy as np

from ucod_dpl_tpu.utils.fileio import ArrayCache, save_binary_mask


def test_cache_write_then_read(tmp_path):
    cache = ArrayCache(tmp_path / "feat")
    assert cache.mode == "w"
    arrays = [np.random.rand(4, 5).astype(np.float32) for _ in range(3)]
    cache.dump_list(arrays)

    cache2 = ArrayCache(tmp_path / "feat")
    assert cache2.mode == "r"
    assert len(cache2) == 3
    for i, arr in enumerate(arrays):
        np.testing.assert_array_equal(cache2.read(i), arr)


def test_cache_integrity_detects_missing_file(tmp_path):
    cache = ArrayCache(tmp_path / "feat")
    cache.dump_list([np.zeros(3)])
    # corrupt: remove data file
    (tmp_path / "feat" / "data_0.npy").unlink()
    cache3 = ArrayCache(tmp_path / "feat")
    assert cache3.mode == "w"


def test_cache_reads_legacy_torch_pickle(tmp_path):
    import pickle

    import torch

    base = tmp_path / "legacy"
    base.mkdir()
    t = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    with open(base / "data_0.pkl", "wb") as f:
        pickle.dump(t, f)
    with open(base / "index.json", "w") as f:
        json.dump({"0": "data_0.pkl"}, f)

    cache = ArrayCache(base)
    assert cache.mode == "r"
    np.testing.assert_array_equal(cache.read(0), t.numpy())


def test_save_binary_mask(tmp_path):
    from PIL import Image

    mask = np.zeros((8, 8), dtype=np.float32)
    mask[2:5, 3:6] = 1.0
    out = tmp_path / "m.jpg"
    save_binary_mask(mask, out)
    png = tmp_path / "m.png"
    assert png.exists()
    arr = np.array(Image.open(png))
    assert arr.max() == 255 and arr.min() == 0
    np.testing.assert_array_equal(arr > 0, mask > 0)
