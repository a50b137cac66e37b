"""Checkpoint save/load with two-slot rotation.

Functional equivalent of the reference's torch.save checkpoints
(dlrm_s_pytorch.py:1689-1704, :1387-1444): a dict of {model state, optimizer
state, QAT buffers, training progress}. The QAT state (emb scales, running
act ranges, step) rides along exactly like the reference's registered
buffers (quant_modules.py:235-245).

Format: one .npz per checkpoint holding every pytree leaf (keyed by
flattened path) + a JSON metadata sidecar carrying the treedef and training
progress. Alternating two-slot naming ("...{0|1}.ckpt") reproduces the
reference's crash-safe rotation (comm_grad.py:2064-2072).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str,
    state: Any,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save a pytree state + metadata. `path` should end in .npz.

    Metadata travels INSIDE the npz (reserved key ``__metadata__``) so the
    single `os.replace` promotion is atomic — a crash mid-save can never
    leave a slot whose weights and training progress disagree (the two-slot
    crash-safety contract, comm_grad.py:2064-2072).
    """
    leaves = _flatten_with_paths(state)
    meta_json = json.dumps(dict(metadata or {}), default=float)
    tmp = path + ".tmp"
    np.savez(tmp, __metadata__=np.frombuffer(meta_json.encode(), np.uint8), **leaves)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, Dict[str, Any]]:
    """Load into the structure of `like` (an initialized state pytree).

    Mirrors the reference's load-into-constructed-model flow
    (dlrm_s_pytorch.py:1387-1405); shapes must match.
    """
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}"
            )
        target = np.asarray(leaf).dtype
        if arr.dtype.kind == "V" and arr.dtype.itemsize == target.itemsize:
            # np.savez stores ml_dtypes arrays (bfloat16) as raw void
            # records; reinterpret the bytes as the model's dtype
            arr = arr.view(target)
        new_leaves.append(jax.numpy.asarray(arr, dtype=target))
    if "__metadata__" in data:
        meta = json.loads(bytes(data["__metadata__"]).decode())
    else:
        # legacy sidecar format
        meta_path = path + ".meta.json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta


def load_metadata(path: str) -> Dict[str, Any]:
    """Read ONLY the metadata of a checkpoint (no weights materialized).

    Checkpoints written by train.py carry the true architecture
    (`table_sizes` etc. — including exact QR/MD row counts, which the
    parameter SHAPES alone only bound by ceil(n/c)*c), so tools can
    reconstruct the exact DLRMConfig without the original CLI flags.
    """
    with np.load(path, allow_pickle=False) as data:
        if "__metadata__" in data:
            return json.loads(bytes(data["__metadata__"]).decode())
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


class CheckpointManager:
    """Two-slot alternating checkpoints: "even if the machine crashes during
    a save, at least one checkpoint survives" (comm_grad.py:2064-2072)."""

    def __init__(self, directory: str, prefix: str = "dqrm"):
        self.directory = directory
        self.prefix = prefix
        self._slot = 0
        os.makedirs(directory, exist_ok=True)

    def slot_path(self, slot: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}_{slot}.npz")

    def save(self, state: Any, metadata: Optional[Dict[str, Any]] = None) -> str:
        path = self.slot_path(self._slot)
        save_checkpoint(path, state, metadata)
        self._slot = 1 - self._slot
        return path

    def latest(self) -> Optional[str]:
        """Most recently modified existing slot."""
        candidates = [
            p for p in (self.slot_path(0), self.slot_path(1)) if os.path.exists(p)
        ]
        if not candidates:
            return None
        return max(candidates, key=os.path.getmtime)

    def restore(self, like: Any) -> Tuple[Any, Dict[str, Any]]:
        path = self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return load_checkpoint(path, like)
