"""Multi-M-table scatter decomposition: does sortedness help DRAM locality?

At B=8192 the five multi-M Kaggle tables dominate the megastep (plain
scatter ~130-160 ns/row vs ~35 on small tables). The batched payload sort
costs only ~12 us/table (measured 2026-08-21), so IF a sorted duplicate
scatter (indices_are_sorted=True, NO coalesce) runs significantly faster
on huge tables, sort+scatter beats plain. This script decomposes:

  plain          at[ids].add, duplicates, unsorted
  sorted-hint    payload-sort ids+vals in-chain, then at[].add with
                 indices_are_sorted=True (duplicates legal)
  coalesce+hints the full coalesce + unique+sorted scatter

Usage: python scripts/bench_bigtable_scatter.py [--rows R ...] [--batch B]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_ms(fn, state, n1=10, n2=40):
    state = fn(state)

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
    ap.add_argument("--rows", type=int, nargs="*",
                    default=[2202608, 10131227])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="> 0: draw ids from a Zipf(a) over the table "
                         "(real Criteo ids are heavily skewed; uniform is "
                         "the scatter's worst case — no duplicates to "
                         "coalesce away)")
    args = ap.parse_args()
    B, D = args.batch, args.dim

    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        coalesce_sparse_grad,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.stream_update import (
        sort_sparse_grad,
    )

    for R in args.rows:
        table0 = jax.random.normal(jax.random.PRNGKey(0), (R, D), jnp.float32)
        if args.zipf > 0:
            rng = np.random.default_rng(1)
            raw = rng.zipf(args.zipf, size=B)
            ids0 = jnp.asarray(((raw - 1) % R).astype(np.int32))
            uniq = len(np.unique(np.asarray(ids0)))
            print(f"zipf a={args.zipf}: {uniq} unique of {B} draws")
        else:
            ids0 = jax.random.randint(
                jax.random.PRNGKey(1), (B,), 0, R, jnp.int32
            )
        vals0 = (
            jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.float32)
            * 1e-4
        )
        jax.block_until_ready((table0, ids0, vals0))

        if args.zipf > 0:
            # preserve the skewed id MULTISET across chain iterations (the
            # rehash below would flatten it to uniform): rotate positions
            # by a table-dependent amount.
            def next_ids(table, ids):
                salt = (table[0, 0] * 1e6).astype(jnp.int32)
                return jnp.roll(ids, 1 + jax.lax.rem(salt, 7))
        else:
            def next_ids(table, ids):
                salt = (table[0, 0] * 1e6).astype(jnp.int32)
                return (ids * 1103515245 + 12345 + salt) % R

        res = {}

        @jax.jit
        def s_plain(st):
            t, i = st
            t2 = t.at[i].add(vals0, mode="drop")
            return t2, next_ids(t2, i)

        res["plain"], _ = chain_ms(s_plain, (table0, ids0))

        @jax.jit
        def s_sorted(st):
            t, i = st
            si, sv = sort_sparse_grad(i, vals0)
            t2 = t.at[si].add(sv, mode="drop", indices_are_sorted=True)
            return t2, next_ids(t2, i)

        res["sorted-hint"], _ = chain_ms(s_sorted, (table0, ids0))

        @jax.jit
        def s_sorted_nohint(st):
            # isolates the HINT's effect from the sort's locality effect
            t, i = st
            si, sv = sort_sparse_grad(i, vals0)
            t2 = t.at[si].add(sv, mode="drop")
            return t2, next_ids(t2, i)

        res["sorted-nohint"], _ = chain_ms(s_sorted_nohint, (table0, ids0))

        @jax.jit
        def s_coal(st):
            t, i = st
            u, uv = coalesce_sparse_grad(i, vals0, R, B)
            t2 = t.at[u].add(uv, mode="drop", unique_indices=True,
                             indices_are_sorted=True)
            return t2, next_ids(t2, i)

        res["coalesce+hints"], _ = chain_ms(s_coal, (table0, ids0))

        print(f"rows={R} batch={B} dim={D}", flush=True)
        for k, v in res.items():
            print(f"  {k:16s} {v:8.3f} ms  ({v * 1e6 / B:7.1f} ns/row)",
                  flush=True)
        del table0, ids0, vals0


if __name__ == "__main__":
    main()
