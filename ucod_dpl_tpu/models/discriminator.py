"""Adversarial mask discriminator — TPU-native rebuild of the reference
``Discriminator`` (``models/discriminator.py:73-95``).

Architecture: ConvBlock(mask 1->32, 3x3 s1) [+ optional feature branch],
two stride-2 ConvBlocks halving channels, flatten, Linear -> sigmoid.
Every ConvBlock is conv(bias-free) + batch-norm + leaky-relu(0.1).

Batch norm runs in batch-statistics mode: the reference only ever calls the
discriminator in train mode (it is unused at eval), so normalisation always
uses the current batch's biased moments.  Running statistics are carried in
the params purely for checkpoint compatibility and updated functionally.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")
_LEAKY_SLOPE = 0.1
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _conv_init(key, k: int, c_in: int, c_out: int):
    """torch Conv2d kaiming-uniform(a=sqrt(5)) for a k x k kernel, HWIO."""
    fan_in = c_in * k * k
    bound = jnp.sqrt(6.0 / ((1 + 5.0) * fan_in))  # gain^2=2/(1+a^2)=1/3 -> sqrt(3*1/3/fan)
    return jax.random.uniform(
        key, (k, k, c_in, c_out), minval=-bound, maxval=bound, dtype=jnp.float32
    )


def _init_conv_block(key, k: int, c_in: int, c_out: int) -> Dict[str, Any]:
    return {
        "conv_w": _conv_init(key, k, c_in, c_out),
        "bn_scale": jnp.ones((c_out,), jnp.float32),
        "bn_bias": jnp.zeros((c_out,), jnp.float32),
        "bn_mean": jnp.zeros((c_out,), jnp.float32),
        "bn_var": jnp.ones((c_out,), jnp.float32),
    }


def _conv_block(params: Dict[str, Any], x: jnp.ndarray, stride: int) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    y = jax.lax.conv_general_dilated(
        x,
        params["conv_w"],
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
        precision=jax.lax.Precision.HIGHEST,
    )
    # batch statistics over (B, H, W), biased variance (torch train-mode BN)
    mean = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.mean((y - mean) ** 2, axis=(0, 1, 2))
    y = (y - mean) * jax.lax.rsqrt(var + _BN_EPS)
    y = y * params["bn_scale"] + params["bn_bias"]
    y = jnp.where(y >= 0, y, _LEAKY_SLOPE * y)

    n = x.shape[0] * y.shape[1] * y.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        **params,
        "bn_mean": (1 - _BN_MOMENTUM) * params["bn_mean"] + _BN_MOMENTUM * mean,
        "bn_var": (1 - _BN_MOMENTUM) * params["bn_var"] + _BN_MOMENTUM * unbiased,
    }
    return y, new_stats


def init_discriminator(
    key: jax.Array,
    feature_size: int = 68,
    feature_dim: int = 768,
    use_features: bool = False,
) -> Dict[str, Any]:
    keys = jax.random.split(key, 5)
    indim = (feature_dim if use_features else 0) + 32
    outdim = indim // 2
    params: Dict[str, Any] = {
        "use_features": use_features,
        "mask_conv": _init_conv_block(keys[0], 3, 1, 32),
        "convs": [
            _init_conv_block(keys[2], 3, indim, outdim),
            _init_conv_block(keys[3], 3, indim // 2, outdim // 2),
        ],
    }
    if use_features:
        params["feature_conv"] = _init_conv_block(keys[1], 3, feature_dim, feature_dim)
    flat = (outdim // 2) * ((feature_size + 3) // 4) ** 2
    wkey, bkey = jax.random.split(keys[4])
    bound = 1.0 / jnp.sqrt(flat)
    params["linear_w"] = jax.random.uniform(
        wkey, (flat, 1), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    params["linear_b"] = jax.random.uniform(
        bkey, (1,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return params


def discriminator_forward(
    params: Dict[str, Any],
    mask: jnp.ndarray,
    features: jnp.ndarray | None = None,
    *,
    update_stats: bool = False,
):
    """Score masks as real/fake.

    Args:
      params: discriminator pytree from :func:`init_discriminator`.
      mask: (B, H, W, 1) mask (NHWC).
      features: optional (B, H, W, feature_dim) when ``use_features``.
      update_stats: also return params with refreshed BN running stats.

    Returns:
      (B, 1) sigmoid probabilities — and updated params if requested.
    """
    x, mc = _conv_block(params["mask_conv"], mask, stride=1)
    new_params = dict(params)
    new_params["mask_conv"] = mc
    if params["use_features"]:
        f, fc = _conv_block(params["feature_conv"], features, stride=1)
        new_params["feature_conv"] = fc
        x = jnp.concatenate([x, f], axis=-1)

    new_blocks = []
    for blk in params["convs"]:
        x, nb = _conv_block(blk, x, stride=2)
        new_blocks.append(nb)
    new_params["convs"] = new_blocks

    # torch flattens NCHW (channel-major); transpose before flattening so the
    # linear layer weights map 1:1 onto reference checkpoints
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    logits = (
        jnp.einsum("bf,fo->bo", x, params["linear_w"], precision=jax.lax.Precision.HIGHEST)
        + params["linear_b"]
    )
    probs = jax.nn.sigmoid(logits)
    if update_stats:
        return probs, new_params
    return probs
