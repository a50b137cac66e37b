"""Orbax-backed checkpointing for sharded (multi-host) training state.

The npz checkpoints (utils/checkpoint.py) cover single-host state; for
mesh-sharded state — the hybrid engine's row-sharded mega-table lives
distributed across devices/hosts — Orbax writes each shard from its owner
process and restores with the target sharding, with no full-array
gather through host 0. This is the multi-host upgrade of the reference's
torch.save flow (dlrm_s_pytorch.py:1689-1704).

Keeps the same two-slot rotation semantics as CheckpointManager.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_sharded(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a (possibly sharded) pytree. Every process participates."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    if metadata and jax.process_index() == 0:
        import json

        with open(os.path.abspath(path) + ".meta.json", "w") as f:
            json.dump(metadata, f, default=float)


def restore_sharded(path: str, like: Any) -> Tuple[Any, Dict]:
    """Restore into the structure AND shardings of `like` (an initialized
    state pytree — its arrays' shardings drive distributed restore)."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(
            sharding=getattr(x, "sharding", None), dtype=x.dtype
        )
        if hasattr(x, "dtype")
        else ocp.RestoreArgs(),
        like,
    )
    restored = ckptr.restore(
        os.path.abspath(path), item=like, restore_args=restore_args
    )
    meta = {}
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


class ShardedCheckpointManager:
    """Two-slot rotation over Orbax saves (crash-safe, comm_grad.py:
    2064-2072 semantics)."""

    def __init__(self, directory: str, prefix: str = "dqrm"):
        self.directory = os.path.abspath(directory)
        self.prefix = prefix
        self._slot = 0
        if jax.process_index() == 0:
            os.makedirs(self.directory, exist_ok=True)

    def slot_path(self, slot: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}_{slot}")

    def save(self, state: Any, metadata: Optional[Dict] = None) -> str:
        path = self.slot_path(self._slot)
        save_sharded(path, state, metadata)
        self._slot = 1 - self._slot
        return path

    def latest(self) -> Optional[str]:
        cands = [
            p
            for p in (self.slot_path(0), self.slot_path(1))
            if os.path.isdir(p)
        ]
        if not cands:
            return None
        return max(cands, key=os.path.getmtime)

    def restore(self, like: Any) -> Tuple[Any, Dict]:
        path = self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return restore_sharded(path, like)
