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


_META_KEY = "__meta_json__"


def _write_json_atomic(path: str, obj: Dict[str, Any]) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def save_train_state(
    path: str, state: Any, metadata: Dict[str, Any], backend: str = "npz"
) -> None:
    """Save a pytree + JSON metadata (``backend``: 'npz' or 'orbax').

    ATOMICITY: the preemption path overwrites a FIXED path (state_preempt)
    on every signal, and a platform SIGKILL can land mid-save — a direct
    write would destroy the previous good checkpoint and/or leave a new
    state file paired with a STALE .json (whose epoch/phase would make the
    resumed run re-apply already-applied batches).  So the npz embeds the
    metadata INSIDE the archive (one os.replace = one commit point) and
    goes through a temp file; the sidecar .json is a human-readable
    convenience written after, and the loader prefers the embedded copy.
    The orbax branch finalises atomically itself; its metadata rides as a
    fixed-size uint8 leaf for the same reason."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    meta_json = json.dumps(metadata)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path) + ".orbax",
            {"state": state, _META_KEY: _meta_to_u8(meta_json)},
            force=True,
        )
        ckptr.wait_until_finished()
        stale = path + ".npz"  # a leftover other-backend file at the same
        # path would otherwise win the load-time detection with OLD state
        if os.path.exists(stale):
            os.unlink(stale)
    elif backend == "npz":
        flat = _flatten_with_paths(state)
        flat[_META_KEY] = np.frombuffer(meta_json.encode(), dtype=np.uint8)
        tmp = f"{path}.npz.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path + ".npz")
        stale = path + ".orbax"
        if os.path.isdir(stale):
            import shutil

            shutil.rmtree(stale)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    _write_json_atomic(path + ".json", metadata)


_META_PAD = 4096


def _meta_to_u8(meta_json: str) -> np.ndarray:
    raw = meta_json.encode()
    if len(raw) > _META_PAD:
        raise ValueError(f"checkpoint metadata exceeds {_META_PAD} bytes")
    out = np.zeros((_META_PAD,), np.uint8)
    out[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    return out


def _meta_from_u8(arr: np.ndarray) -> Dict[str, Any]:
    raw = bytes(np.asarray(arr, np.uint8))
    return json.loads(raw.rstrip(b"\x00").decode())


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
        try:
            wrapped = ckptr.restore(
                os.path.abspath(path) + ".orbax",
                {"state": template, _META_KEY: np.zeros((_META_PAD,), np.uint8)},
            )
            return wrapped["state"], _meta_from_u8(wrapped[_META_KEY])
        except Exception:
            # pre-embedded-metadata checkpoint: bare-state layout + sidecar
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
    if _META_KEY in data.files:
        # embedded metadata is the source of truth: it committed in the
        # same os.replace as the state (the sidecar .json can be one save
        # older after a crash)
        metadata = json.loads(bytes(data[_META_KEY]).rstrip(b"\x00").decode())
    else:  # pre-embedded-metadata checkpoint
        with open(path + ".json") as f:
            metadata = json.load(f)
    return state, metadata
