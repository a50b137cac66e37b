"""Row-update (scatter-add) strategy shootout on the real chip.

The training step's wall at large batch is the embedding scatter-add:
34 ns/row measured for XLA's serial read-modify-write at B=8192
(CLAUDE.md fourth-session notes). This bench isolates ONE table update
and measures every candidate strategy with the honest chain-slope
methodology (each variant's update feeds the next iteration's input so
the chain serializes; one scalar readback at the end):

  a. plain .at[ids].add (duplicates allowed) — the current SGD path
  b. pre-sorted ids + indices_are_sorted=True (duplicates allowed)
  c. coalesce_sparse_grad + sorted/unique hints (the adagrad path)
  d. argsort alone / take-reorder alone (cost decomposition)
  e. jax.ops.segment_sum into dense then add (dense-grad formulation)
  f. (separate script) Pallas DMA row-update kernel

Usage: python scripts/bench_row_update.py [--rows 93145] [--batch 8192]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_ms(fn, state, n1=20, n2=60):
    """fn(state) -> state (same structure). Chain-slope ms per call."""
    state = fn(state)
    jax.tree_util.tree_map(lambda x: x, state)
    # force completion via scalar readback of a chained output
    def run(n, st):
        t0 = time.perf_counter()
        for _ in range(n):
            st = fn(st)
        _ = float(jax.tree_util.tree_leaves(st)[0].ravel()[0])
        return time.perf_counter() - t0, st

    _, state = run(3, state)
    t1, state = run(n1, state)
    t2, state = run(n2, state)
    return (t2 - t1) / (n2 - n1) * 1e3, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=93145)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=16)
    args = ap.parse_args()
    R, B, D = args.rows, args.batch, args.dim

    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        coalesce_sparse_grad,
    )

    key = jax.random.PRNGKey(0)
    table0 = jax.random.normal(key, (R, D), jnp.float32)
    ids0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, R, jnp.int32)
    vals0 = jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.float32) * 1e-4

    results = {}

    # Derive the next iteration's ids from the table so the chain
    # serializes (cheap hash of one table element).
    def next_ids(table, ids):
        salt = (table[0, 0] * 1e6).astype(jnp.int32)
        return (ids * 1103515245 + 12345 + salt) % R

    # a) plain scatter-add
    @jax.jit
    def step_a(st):
        table, ids = st
        t2 = table.at[ids].add(vals0, mode="drop")
        return t2, next_ids(t2, ids)

    ms, _ = chain_ms(step_a, (table0, ids0))
    results["a_plain_scatter"] = ms

    # b) sort + sorted-hint scatter (duplicates still present)
    @jax.jit
    def step_b(st):
        table, ids = st
        order = jnp.argsort(ids)
        t2 = table.at[ids[order]].add(
            jnp.take(vals0, order, axis=0), mode="drop",
            indices_are_sorted=True,
        )
        return t2, next_ids(t2, ids)

    ms, _ = chain_ms(step_b, (table0, ids0))
    results["b_sorted_scatter"] = ms

    # b2) sorted-hint scatter only (ids pre-sorted outside the timing —
    # upper bound on the win if sorting were free)
    ids_sorted = jnp.sort(ids0)

    @jax.jit
    def step_b2(st):
        table, ids = st
        t2 = table.at[ids_sorted].add(vals0, mode="drop",
                                      indices_are_sorted=True)
        return t2, ids

    ms, _ = chain_ms(step_b2, (table0, ids0))
    results["b2_presorted_scatter"] = ms

    # c) full coalesce + sorted/unique scatter
    @jax.jit
    def step_c(st):
        table, ids = st
        uids, uvals = coalesce_sparse_grad(ids, vals0, R, min(B, R))
        t2 = table.at[uids].add(
            uvals, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return t2, next_ids(t2, ids)

    ms, _ = chain_ms(step_c, (table0, ids0))
    results["c_coalesce_scatter"] = ms

    # d) decomposition: argsort alone; gather-reorder alone
    @jax.jit
    def step_d1(st):
        table, ids = st
        order = jnp.argsort(ids)
        return table, (ids + order) % R

    ms, _ = chain_ms(step_d1, (table0, ids0))
    results["d1_argsort_only"] = ms

    @jax.jit
    def step_d2(st):
        table, ids = st
        v = jnp.take(vals0, ids % B, axis=0)
        t2 = table + 0 * v[0, 0]
        return t2, next_ids(t2, ids)

    ms, _ = chain_ms(step_d2, (table0, ids0))
    results["d2_gather_reorder_only"] = ms

    # e) segment_sum into a dense grad then one dense add
    @jax.jit
    def step_e(st):
        table, ids = st
        dense = jax.ops.segment_sum(vals0, ids, num_segments=R)
        t2 = table + dense
        return t2, next_ids(t2, ids)

    ms, _ = chain_ms(step_e, (table0, ids0))
    results["e_segment_sum_dense"] = ms

    print(f"rows={R} batch={B} dim={D}")
    for k, v in results.items():
        print(f"  {k:24s} {v:8.3f} ms  ({v * 1e6 / B:6.1f} ns/row)")


if __name__ == "__main__":
    main()
