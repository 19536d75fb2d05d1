"""Full training-state checkpointing (counterpart of the reference's
``save_mode='all'`` / ``accelerator.save_state`` path, runner.py:165-185,
plus the ``--resume`` flag the reference parses but never consumes).

Model-interchange checkpoints stay in the reference-compatible safetensors
format (models/safetensors_io.py); *resume* state (optimizer moments, EMA
step, epoch) is framework-internal and stored as a single ``.npz`` with
key-path-addressed leaves — no pickle, works for any pytree of arrays.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_train_state(path: str, state: Any, metadata: Dict[str, Any]) -> None:
    """Save a pytree + JSON metadata as ``<path>.npz`` / ``<path>.json``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten_with_paths(state)
    np.savez(path + ".npz", **flat)
    with open(path + ".json", "w") as f:
        json.dump(metadata, f)


def load_train_state(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with the same structure as ``template``."""
    data = np.load(path + ".npz")
    flat_template = _flatten_with_paths(template)
    missing = set(flat_template) - set(data.files)
    if missing:
        raise ValueError(f"Checkpoint {path} missing keys: {sorted(missing)[:5]}...")

    leaves_paths = jax.tree_util.tree_flatten_with_path(template)
    restored_leaves = []
    for path_keys, leaf in leaves_paths[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path_keys
        )
        arr = data[key]
        restored_leaves.append(
            np.asarray(arr, dtype=np.asarray(leaf).dtype).reshape(np.shape(leaf))
        )
    state = jax.tree_util.tree_unflatten(leaves_paths[1], restored_leaves)
    with open(path + ".json") as f:
        metadata = json.load(f)
    return state, metadata
