"""Multi-host initialization + per-host input sharding.

TPU-native replacement for the reference's launcher zoo
(extend_distributed.py:65-194: PMI/OMPI/MVAPICH/torchrun env-var rank
guessing, backend autodetection across nccl/gloo/mpi/ccl/ucc;
bash_scripts/Terabytes/run_dist.sh mpiexec recipes): one call to
`jax.distributed.initialize` discovers the pod topology (GKE/Cloud TPU envs
or explicit coordinator address), after which `jax.devices()` spans all
hosts and every mesh in `parallel/` scales transparently — ICI within a
slice, DCN across slices, with XLA picking the transport (the reference's
backend matrix collapses into XLA collectives).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX; returns (process_index, process_count).

    No-ops on a single host (the reference's my_size==1 fallback,
    extend_distributed.py:133-139). Arguments may come from env
    (COORDINATOR_ADDRESS / WORLD_SIZE-style vars) or auto-detection on
    Cloud TPU.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        for var in ("NUM_PROCESSES", "WORLD_SIZE", "SLURM_NTASKS"):
            if os.environ.get(var):
                num_processes = int(os.environ[var])
                break
    if process_id is None:
        for var in ("PROCESS_ID", "RANK", "SLURM_PROCID"):
            if os.environ.get(var):
                process_id = int(os.environ[var])
                break
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch — each host
    feeds only its local devices (the per-rank batch slicing of
    comm_grad.py:1904-1910, done host-wise)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per


def make_global_batch(local_arrays, mesh, specs):
    """Assemble per-host local arrays into globally-sharded jax.Arrays
    (jax.make_array_from_process_local_data) for pjit/shard_map inputs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(mesh, s), np.asarray(x)
        ),
        local_arrays,
        specs,
    )
