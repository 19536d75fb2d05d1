"""Checkpoint compatibility with the reference's safetensors format.

The released UCOD-DPL checkpoints (``weights/UCOD_DPL_dinov{1,2}.safetensors``)
contain 14 fp32 tensors: ``decoder{,_ema}.decoupling.{weight,bias}``,
``...conv_out_{fg,bg}.{weight,bias}`` and ``...learnable_embedding`` —
verified against the reference's save path (``runner.py:165-185``).

This module converts between that torch-layout checkpoint (OIHW conv kernels)
and our NHWC/matmul parameter pytrees, in both directions, so checkpoints are
interchangeable with the PyTorch reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file

from .dba import RevDecoderParams


def _tower_from_flat(flat: Dict[str, np.ndarray], prefix: str) -> RevDecoderParams:
    def get(name):
        key = f"{prefix}.{name}"
        if key not in flat:
            raise KeyError(f"Checkpoint missing tensor {key!r}; has {sorted(flat)[:6]}...")
        return flat[key]

    dw = get("decoupling.weight")  # (2E, F, 1, 1) OIHW
    fw = get("conv_out_fg.weight")  # (1, E, 1, 1)
    bw = get("conv_out_bg.weight")
    return RevDecoderParams(
        decoupling_w=jnp.asarray(dw[:, :, 0, 0].T),  # -> (F, 2E)
        decoupling_b=jnp.asarray(get("decoupling.bias")),
        learnable_embedding=jnp.asarray(get("learnable_embedding")),
        conv_out_fg_w=jnp.asarray(fw[:, :, 0, 0].T),  # -> (E, 1)
        conv_out_fg_b=jnp.asarray(get("conv_out_fg.bias")),
        conv_out_bg_w=jnp.asarray(bw[:, :, 0, 0].T),
        conv_out_bg_b=jnp.asarray(get("conv_out_bg.bias")),
    )


def _tower_to_flat(params: RevDecoderParams, prefix: str) -> Dict[str, np.ndarray]:
    def np32(x):
        # contiguity matters: safetensors serialises the raw buffer
        return np.ascontiguousarray(np.asarray(x, dtype=np.float32))

    def conv_oihw(w):
        return np32(np.asarray(w, dtype=np.float32).T[:, :, None, None])

    return {
        f"{prefix}.decoupling.weight": conv_oihw(params.decoupling_w),
        f"{prefix}.decoupling.bias": np32(params.decoupling_b),
        f"{prefix}.learnable_embedding": np32(params.learnable_embedding),
        f"{prefix}.conv_out_fg.weight": conv_oihw(params.conv_out_fg_w),
        f"{prefix}.conv_out_fg.bias": np32(params.conv_out_fg_b),
        f"{prefix}.conv_out_bg.weight": conv_oihw(params.conv_out_bg_w),
        f"{prefix}.conv_out_bg.bias": np32(params.conv_out_bg_b),
    }


def load_decoder_checkpoint(path: str) -> Tuple[RevDecoderParams, RevDecoderParams]:
    """Load a reference-format checkpoint -> (student, ema_teacher) params."""
    flat = load_file(path)
    return _tower_from_flat(flat, "decoder"), _tower_from_flat(flat, "decoder_ema")


def save_file_atomic(flat, path: str) -> None:
    """safetensors save via temp + os.replace.

    Auto-resume picks the NEWEST epoch*.safetensors by mtime with no
    fallback, so a crash/OOM-kill mid-write must never leave a truncated
    file at the final path — with the rename, the newest file is always a
    complete one."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        save_file(flat, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_decoder_checkpoint(
    path: str, decoder: RevDecoderParams, decoder_ema: RevDecoderParams
) -> None:
    """Save params in the reference's safetensors layout."""
    flat = {**_tower_to_flat(decoder, "decoder"), **_tower_to_flat(decoder_ema, "decoder_ema")}
    save_file_atomic(flat, path)
