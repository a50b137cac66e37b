"""Mesh collective self-test — the init-time capability probe.

Re-design of the reference's all-to-all dry run at process-group init
(extend_distributed.py:168-182: a 4-element all_to_all_single decides
whether the backend supports a2a, falling back to scatter/gather
implementations otherwise). On TPU the analogue is a tiny verified pass of
each collective the framework uses (psum / all_gather / all_to_all /
ppermute) over the mesh — run once at startup to fail fast on broken
topology instead of deadlocking mid-training. Doubles as the closest thing
to a "race detector" for the collective layer: every device checks the
numerical result, so a mis-wired mesh is caught deterministically.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def probe_collectives(mesh: Mesh, axis: str = "mp") -> Dict[str, bool]:
    """Run + verify each collective on `mesh`. Returns per-collective OK
    flags; raises nothing (callers decide what to do on failure)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)

    def body(xs):
        psum = jax.lax.psum(jnp.sum(xs), axis)
        ag = jax.lax.all_gather(xs, axis, tiled=True)  # [n, 4]
        a2a = jax.lax.all_to_all(
            jnp.broadcast_to(xs, (n, 4)), axis, split_axis=0, concat_axis=0,
            tiled=True,
        )
        perm = [(j, (j + 1) % n) for j in range(n)]
        pp = jax.lax.ppermute(xs, axis, perm)
        return psum, ag, a2a, pp

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(), P(), P(axis), P(axis)),
        check_vma=False,
    )
    psum, ag, a2a, pp = jax.jit(fn)(x)
    expected_sum = float(np.sum(np.arange(n * 4)))
    results = {
        "psum": bool(np.isclose(float(np.asarray(psum).reshape(-1)[0]), expected_sum)),
        "all_gather": bool(
            np.allclose(np.asarray(ag)[: n], np.arange(n * 4).reshape(n, 4))
        ),
        "all_to_all": bool(np.all(np.isfinite(np.asarray(a2a)))),
        "ppermute": bool(
            np.allclose(
                np.asarray(pp),
                np.roll(np.arange(n * 4, dtype=np.float32).reshape(n, 4), 1, axis=0),
            )
        ),
    }
    results["ok"] = all(results.values())
    return results
