"""Tensor-parallel sharding specs for the DINO ViT backbone.

The decoder (~200K params) replicates; the 86M-param ViT is where TP pays
off on larger meshes.  Standard Megatron-style column/row split: q/k/v and
fc1 are column-parallel (heads / hidden split over the ``model`` axis), the
attention output projection and fc2 are row-parallel — GSPMD inserts the
single all-reduce per block.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dino_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a dino params pytree."""

    def layer_spec(_layer):
        spec = {
            "norm1": {"scale": P(), "bias": P()},
            "q": {"w": P(None, "model"), "b": P("model")},
            "k": {"w": P(None, "model"), "b": P("model")},
            "v": {"w": P(None, "model"), "b": P("model")},
            "out": {"w": P("model", None), "b": P()},
            "norm2": {"scale": P(), "bias": P()},
            "fc1": {"w": P(None, "model"), "b": P("model")},
            "fc2": {"w": P("model", None), "b": P()},
        }
        if "ls1" in _layer:
            spec["ls1"] = P()
            spec["ls2"] = P()
        return spec

    return {
        "patch_embed": {"kernel": P(), "bias": P()},
        "cls_token": P(),
        "pos_embed": P(),
        "layers": [layer_spec(l) for l in params["layers"]],
        "final_norm": {"scale": P(), "bias": P()},
    }


def shard_dino_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place dino params on the mesh with TP sharding over the 'model' axis."""
    specs = dino_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"),
    )
