"""DataLoader: prefetch correctness, sharding, error propagation."""

import numpy as np
import pytest

from ucod_dpl_tpu.data.dataset import DataLoader, collate


class ListDataset:
    def __init__(self, n):
        self.items = [{"x": np.full((2, 2), i, np.float32), "path": f"p{i}"} for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _seen(loader):
    vals = []
    for batch in loader:
        vals.extend(batch["x"][:, 0, 0].tolist())
    return vals


def test_prefetch_matches_sync():
    ds = ListDataset(10)
    sync = _seen(DataLoader(ds, batch_size=3, prefetch=0))
    pre = _seen(DataLoader(ds, batch_size=3, prefetch=2))
    assert sync == pre == list(map(float, range(10)))


def test_shuffle_deterministic_by_seed():
    ds = ListDataset(16)
    a = _seen(DataLoader(ds, batch_size=4, shuffle=True, seed=7))
    b = _seen(DataLoader(ds, batch_size=4, shuffle=True, seed=7))
    assert a == b
    assert sorted(a) == list(map(float, range(16)))


def test_sharding_partitions_dataset():
    ds = ListDataset(10)
    seen = []
    for rank in range(3):
        seen += _seen(DataLoader(ds, batch_size=2, shard=(rank, 3)))
    assert sorted(seen) == list(map(float, range(10)))


def test_drop_last():
    ds = ListDataset(10)
    loader = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(loader) == 2
    assert len(_seen(loader)) == 8


def test_loader_error_propagates():
    class Bad(ListDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        _seen(DataLoader(Bad(10), batch_size=2, prefetch=2))


def test_collate_ragged_and_none():
    samples = [
        {"a": np.zeros((2, 2)), "b": None, "c": "x", "d": np.zeros((1,))},
        {"a": np.zeros((2, 2)), "b": None, "c": "y", "d": np.zeros((3,))},
    ]
    out = collate(samples)
    assert out["a"].shape == (2, 2, 2)
    assert out["b"] == [None, None]
    assert out["c"] == ["x", "y"]
    assert isinstance(out["d"], list)  # ragged stays a list
