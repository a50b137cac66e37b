"""Device mesh construction and table-partitioning utilities.

TPU-native replacement for the reference's process-group plumbing
(extend_distributed.py:65-194): instead of NCCL/gloo/MPI process groups with
env-var rank discovery, we build a `jax.sharding.Mesh` over
`jax.devices()` (ICI within a slice; `jax.distributed.initialize` extends to
multi-host/DCN) and express every collective inside `shard_map`.

The uneven-partition helpers reproduce `get_my_slice`/`get_split_lengths`
(extend_distributed.py:47-63): n items over `size` ranks, first n % size
ranks get one extra.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "mp",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first `num_devices` devices.

    The reference's hybrid parallelism uses a single process group for both
    table-sharding and MLP data-parallelism (dlrm_s_pytorch_hybrid_multi_gpu
    .py:1512-1518); the analogue is one mesh axis reused for both roles.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def get_my_slice(n: int, size: int, rank: int) -> slice:
    """Rank's slice of n items (extend_distributed.py:47-52)."""
    k, m = divmod(n, size)
    return slice(rank * k + min(rank, m), (rank + 1) * k + min(rank + 1, m), 1)


def get_split_lengths(n: int, size: int) -> Tuple[int, List[int]]:
    """(max_len, per-rank lengths) for n items over `size` ranks
    (extend_distributed.py:54-63). Always returns explicit lengths — static
    shapes require the padded max, so callers pad to `max_len`."""
    k, m = divmod(n, size)
    splits = [(k + 1) if i < m else k for i in range(size)]
    return (max(splits), splits)


def table_assignment(num_tables: int, size: int) -> List[List[int]]:
    """Contiguous table->rank assignment matching get_my_slice semantics
    (dlrm_s_pytorch.py:243-245 `local_emb_indices`). Returns per-rank table
    index lists; uneven counts are padded by callers."""
    return [
        list(range(*get_my_slice(num_tables, size, r).indices(num_tables)))
        for r in range(size)
    ]
