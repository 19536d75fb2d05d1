"""Tensor-parallel backbone on the 8-device CPU mesh: sharded runs must match
the single-device computation."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ucod_dpl_tpu.models.dino import DinoConfig, dino_forward, init_dino
from ucod_dpl_tpu.parallel import build_mesh
from ucod_dpl_tpu.parallel.tp import shard_dino_params

CFG = DinoConfig(
    variant="dinov2",
    image_size=28,
    patch_size=14,
    hidden_size=128,
    num_layers=2,
    num_heads=8,
    mlp_ratio=2,
    use_layerscale=True,
)


def test_tp_backbone_matches_single_device():
    bb = init_dino(jax.random.PRNGKey(0), CFG)
    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 28, 28, 3)).astype(np.float32)
    )
    ref = np.asarray(dino_forward(bb, px, CFG)["key_features"])

    mesh = build_mesh({"data": 4, "model": 2})
    bb_sharded = shard_dino_params(bb, mesh)
    px_sharded = jax.device_put(px, NamedSharding(mesh, P("data", None, None, None)))

    fwd = jax.jit(
        lambda p, x: dino_forward(p, x, CFG, tp_shard=(mesh, "model"))["key_features"]
    )
    out = np.asarray(fwd(bb_sharded, px_sharded))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tp_attention_matches_dense():
    from ucod_dpl_tpu.ops.attention import multi_head_attention, tp_multi_head_attention

    mesh = build_mesh({"data": 2, "model": 4})
    rng = np.random.default_rng(1)
    b, l, nh, hd = 2, 64, 8, 16
    q = jnp.asarray(rng.standard_normal((b, l, nh * hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, nh * hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, nh * hd)).astype(np.float32))
    ref = multi_head_attention(q, k, v, nh, scale=0.25)
    out = jax.jit(
        lambda q, k, v: tp_multi_head_attention(
            q, k, v, nh, scale=0.25, mesh=mesh, axis="model"
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_build_mesh_refuses_partial_coverage():
    """A mesh that would silently strand devices must raise (e.g. asking for
    model=3 on 8 devices used to quietly build a 6-device mesh)."""
    import pytest

    with pytest.raises(ValueError, match="device"):
        build_mesh({"data": -1, "model": 3})  # 3 does not divide 8
    with pytest.raises(ValueError, match="device"):
        build_mesh({"data": 2, "model": 2})  # covers 4 of 8
    m = build_mesh({"data": -1, "model": 2})
    assert m.shape["data"] * m.shape["model"] == 8
