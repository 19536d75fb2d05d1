"""Parity of resampling ops vs torch.nn.functional (golden oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from ucod_dpl_tpu.ops import (
    adaptive_avg_pool2d,
    avg_pool2d,
    interpolate_bicubic,
    interpolate_bilinear,
)

SIZES = [
    ((2, 3, 37, 37), (68, 68)),   # feature upsample (the hot path)
    ((1, 1, 68, 68), (518, 518)),  # mask upsample
    ((2, 4, 54, 54), (36, 36)),    # downsample
    ((1, 2, 17, 23), (29, 11)),    # non-square, mixed up/down
    ((1, 1, 5, 5), (5, 5)),        # identity
]


@pytest.mark.parametrize("shape,size", SIZES)
def test_bilinear_matches_torch(shape, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), size))
    ref = TF.interpolate(torch.from_numpy(x), size=size, mode="bilinear").numpy()
    # 5e-5: f32 rounding differences between the matmul formulation and
    # torch's direct two-tap interpolation
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("shape,size", [
    ((1, 768, 37, 37), (54, 54)),  # dinov2 pos-embed interpolation shape
    ((1, 3, 16, 16), (7, 7)),
    ((2, 2, 9, 13), (21, 5)),
])
def test_bicubic_matches_torch(shape, size):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(interpolate_bicubic(jnp.asarray(x), size))
    ref = TF.interpolate(torch.from_numpy(x), size=size, mode="bicubic").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((68, 68), (3, 3)), ((55, 41), (7, 5)), ((10, 10), (10, 10))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    ref = TF.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_avg_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 1, 56, 56)).astype(np.float32)
    # GatedEnsembler's local-entropy pooling: 19x19, stride 1, pad 9
    ours = np.asarray(avg_pool2d(jnp.asarray(x), 19, stride=1, padding=9))
    ref = TF.avg_pool2d(torch.from_numpy(x), 19, padding=9, stride=1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bilinear_3d_input():
    # (B, H, W) masks without channel dim should also work
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 14, 14)).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), (28, 28)))
    ref = TF.interpolate(torch.from_numpy(x)[:, None], size=(28, 28), mode="bilinear").numpy()[:, 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
