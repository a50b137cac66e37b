"""Micro-bench: batched coalesce variants at Terabyte shapes (round 5,
VERDICT r4 #4 structure attack).

The TB dp breakdown shows structure cost 1.74 ms/it with quantize free.
Candidate: skip the [T,K,D] sorted-VALUE permutation gather (13.6 MB at
T=26,K=2048,D=64 f32) — scatter UNSORTED values straight to their slot via
the inverse permutation (extra [T,K] int gather only).

Run on chip: python scripts/bench_coalesce_tb.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

T, K, D = 26, 2048, 64
MAXU = K


def current(ids, values, num_rows):
    order = jnp.argsort(ids, axis=1)
    sids = jnp.take_along_axis(ids, order, axis=1)
    svals = jnp.take_along_axis(values, order[..., None], axis=1)
    is_new = jnp.concatenate(
        [jnp.ones((T, 1), jnp.int32),
         (sids[:, 1:] != sids[:, :-1]).astype(jnp.int32)], axis=1)
    slot = jnp.minimum(jnp.cumsum(is_new, axis=1) - 1, MAXU - 1)
    gslot = (jnp.arange(T, dtype=slot.dtype)[:, None] * MAXU + slot).reshape(-1)
    uniq_vals = (
        jnp.zeros((T * MAXU, D), values.dtype).at[gslot].add(
            svals.reshape(T * K, -1)).reshape(T, MAXU, -1))
    pad = (jnp.asarray(num_rows, sids.dtype)[:, None]
           + jnp.arange(MAXU, dtype=sids.dtype)[None, :])
    uniq_ids = pad.reshape(-1).at[gslot].set(sids.reshape(-1)).reshape(T, MAXU)
    return uniq_ids, uniq_vals


def nopermute(ids, values, num_rows):
    order = jnp.argsort(ids, axis=1)
    sids = jnp.take_along_axis(ids, order, axis=1)
    is_new = jnp.concatenate(
        [jnp.ones((T, 1), jnp.int32),
         (sids[:, 1:] != sids[:, :-1]).astype(jnp.int32)], axis=1)
    slot = jnp.minimum(jnp.cumsum(is_new, axis=1) - 1, MAXU - 1)
    inv = jnp.argsort(order, axis=1)  # inverse permutation (ids-only sort)
    occ_slot = jnp.take_along_axis(slot, inv, axis=1)  # [T, K]
    gslot_occ = (
        jnp.arange(T, dtype=slot.dtype)[:, None] * MAXU + occ_slot
    ).reshape(-1)
    uniq_vals = (
        jnp.zeros((T * MAXU, D), values.dtype).at[gslot_occ].add(
            values.reshape(T * K, -1)).reshape(T, MAXU, -1))
    gslot = (jnp.arange(T, dtype=slot.dtype)[:, None] * MAXU + slot).reshape(-1)
    pad = (jnp.asarray(num_rows, sids.dtype)[:, None]
           + jnp.arange(MAXU, dtype=sids.dtype)[None, :])
    uniq_ids = pad.reshape(-1).at[gslot].set(sids.reshape(-1)).reshape(T, MAXU)
    return uniq_ids, uniq_vals


def chain(fn_jit, ids0, values, num_rows, n):
    ids = ids0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn_jit(ids, values, num_rows)
        # state-dependence: feed the output back into the next ids
        ids = (ids0 + out[0][:, :1].astype(ids0.dtype) * 0) % 100000
    float(jnp.sum(out[1][0, 0]))
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(0)
    num_rows = jnp.asarray(
        rng.randint(10000, 10_000_000, size=(T,)).astype(np.int64))
    ids0 = jnp.asarray(rng.randint(0, 100000, size=(T, K)).astype(np.int32))
    values = jnp.asarray(rng.randn(T, K, D).astype(np.float32))

    # equivalence first
    cur = jax.jit(current)
    nop = jax.jit(nopermute)
    a = cur(ids0, values, num_rows)
    b = nop(ids0, values, num_rows)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)
    print("equivalent (atol 1e-4); max dv =",
          float(jnp.max(jnp.abs(a[1] - b[1]))), flush=True)

    for name, f in [("current", cur), ("nopermute", nop),
                    ("current2", cur), ("nopermute2", nop)]:
        chain(f, ids0, values, num_rows, 3)
        chain(f, ids0, values, num_rows, 5)
        t1 = min(chain(f, ids0, values, num_rows, 20) for _ in range(4))
        t2 = min(chain(f, ids0, values, num_rows, 60) for _ in range(4))
        ms = (t2 - t1) / 40 * 1e3
        print(json.dumps({name: round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
