"""Full training-state checkpointing (counterpart of the reference's
``save_mode='all'`` / ``accelerator.save_state`` path, runner.py:165-185,
plus the ``--resume`` flag the reference parses but never consumes).

Model-interchange checkpoints stay in the reference-compatible safetensors
format (models/safetensors_io.py).  *Resume* state (optimizer moments, EMA
step, epoch) has two backends:

  * ``npz`` (default): a single file with key-path-addressed leaves — no
    pickle, zero dependencies, ideal for single-host runs;
  * ``orbax``: production multi-host checkpointing — sharded arrays are
    written per-shard by their owning processes (the npz path would gather
    everything to host 0), with OCDBT storage and atomic finalisation.

``load_train_state`` auto-detects the backend from what is on disk, so
resume works across backend changes.
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


def save_train_state(
    path: str, state: Any, metadata: Dict[str, Any], backend: str = "npz"
) -> None:
    """Save a pytree + JSON metadata (``backend``: 'npz' or 'orbax')."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path) + ".orbax", state, force=True)
        ckptr.wait_until_finished()
        stale = path + ".npz"  # a leftover other-backend file at the same
        # path would otherwise win the load-time detection with OLD state
        if os.path.exists(stale):
            os.unlink(stale)
    elif backend == "npz":
        flat = _flatten_with_paths(state)
        np.savez(path + ".npz", **flat)
        stale = path + ".orbax"
        if os.path.isdir(stale):
            import shutil

            shutil.rmtree(stale)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    with open(path + ".json", "w") as f:
        json.dump(metadata, f)


def load_train_state(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with the same structure as ``template``; the backend
    is auto-detected from what exists at ``path``."""
    has_npz = os.path.exists(path + ".npz")
    has_orbax = os.path.isdir(path + ".orbax")
    if has_npz and has_orbax:  # both present (e.g. crash between save+unlink)
        has_npz = os.path.getmtime(path + ".npz") >= os.path.getmtime(path + ".orbax")
        has_orbax = not has_npz
    if has_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.abspath(path) + ".orbax", template)
        with open(path + ".json") as f:
            metadata = json.load(f)
        return state, metadata
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
