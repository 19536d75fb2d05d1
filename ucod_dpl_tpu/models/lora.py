"""LoRA adaptation of the DINO ViT backbone.

The reference ships a broken end-to-end model that intended LoRA-adapted
q/k/v projections (``models/modules/full_model.py:47-72`` — peft r=2,
alpha=4 on query/key/value; unreachable: it imports a module that does not
exist).  This module provides the *working* capability: low-rank A/B deltas
on the q/k/v projections of every block, trained with the frozen base
weights, mergeable back into dense weights for zero-cost inference.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

_TARGETS = ("q", "k", "v")


def init_lora(
    key: jax.Array,
    dino_params: Dict[str, Any],
    rank: int = 2,
) -> List[Dict[str, Any]]:
    """Per-layer LoRA params (a pure array pytree — rank/alpha stay static
    call arguments): A ~ N(0, 0.02) (d_in, r), B = 0 (r, d_out)."""
    layers: List[Dict[str, Any]] = []
    keys = jax.random.split(key, len(dino_params["layers"]) * len(_TARGETS))
    ki = 0
    for layer in dino_params["layers"]:
        entry = {}
        for t in _TARGETS:
            d_in, d_out = layer[t]["w"].shape
            entry[t] = {
                "a": jax.random.normal(keys[ki], (d_in, rank), dtype=jnp.float32) * 0.02,
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
            ki += 1
        layers.append(entry)
    return layers


def apply_lora(
    dino_params: Dict[str, Any],
    lora: List[Dict[str, Any]],
    rank: int = 2,
    alpha: float = 4.0,
) -> Dict[str, Any]:
    """Return dino params with the LoRA deltas merged into q/k/v weights.

    W' = W + (A @ B) * alpha / rank — merged densely, so the adapted model
    runs at exactly the base model's cost (and can be saved/loaded through
    the standard HF-layout converters)."""
    scale = alpha / rank
    new_layers = []
    for layer, entry in zip(dino_params["layers"], lora):
        new_layer = dict(layer)
        for t in _TARGETS:
            delta = jnp.dot(entry[t]["a"], entry[t]["b"], precision=jax.lax.Precision.HIGHEST)
            new_layer[t] = {
                "w": layer[t]["w"] + scale * delta,
                "b": layer[t]["b"],
            }
        new_layers.append(new_layer)
    out = dict(dino_params)
    out["layers"] = new_layers
    return out


def lora_forward(dino_params, lora, pixels, cfg, rank: int = 2, alpha: float = 4.0, **kwargs):
    """Forward through the LoRA-adapted backbone.

    Differentiable w.r.t. ``lora`` only when ``dino_params`` is wrapped in
    ``jax.lax.stop_gradient`` by the caller (the base stays frozen).

    Traced inside :class:`~ucod_dpl_tpu.ops.attention.differentiable_mode`:
    the packed Pallas attention KEEPS its kernel (it carries a flash
    backward, ``ops/attention.py::_pallas_attention_packed_bwd``); only the
    VJP-less fused LayerNorm+QKV reroutes to its XLA equivalent."""
    from ucod_dpl_tpu.models.dino import dino_forward
    from ucod_dpl_tpu.ops.attention import differentiable_mode

    with differentiable_mode():
        return dino_forward(
            apply_lora(dino_params, lora, rank, alpha), pixels, cfg, **kwargs
        )


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------


def save_lora_checkpoint(path: str, lora: List[Dict[str, Any]]) -> None:
    """Adapters as safetensors with flat keys ``layers.{i}.{q|k|v}.{a|b}``."""
    import os

    import numpy as np

    flat = {}
    for i, entry in enumerate(lora):
        for t in _TARGETS:
            for name in ("a", "b"):
                flat[f"layers.{i}.{t}.{name}"] = np.asarray(
                    entry[t][name], dtype=np.float32
                )
    from ucod_dpl_tpu.models.safetensors_io import save_file_atomic

    save_file_atomic(flat, path)


def load_lora_checkpoint(path: str) -> List[Dict[str, Any]]:
    from safetensors.numpy import load_file

    flat = load_file(path)
    n_layers = 1 + max(int(k.split(".")[1]) for k in flat)
    return [
        {
            t: {
                "a": jnp.asarray(flat[f"layers.{i}.{t}.a"]),
                "b": jnp.asarray(flat[f"layers.{i}.{t}.b"]),
            }
            for t in _TARGETS
        }
        for i in range(n_layers)
    ]


def save_merged_backbone(
    path: str,
    dino_params: Dict[str, Any],
    lora: List[Dict[str, Any]],
    cfg,
    rank: int = 2,
    alpha: float = 4.0,
) -> None:
    """Merge the adapters densely and export as a standard HF-layout
    safetensors checkpoint: serving/eval load it through the ordinary
    ``backbone_weights`` path at exactly the base model's inference cost."""
    from ucod_dpl_tpu.models.dino import save_hf_checkpoint

    save_hf_checkpoint(path, apply_lora(dino_params, lora, rank, alpha), cfg)
