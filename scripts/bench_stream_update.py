"""On-chip shootout: streaming/DMA scatter-add kernels vs the XLA scatter.

Measures, per (rows, batch) point with the HONEST chain-slope methodology
(state-dependent chained dispatches, one scalar readback, slope between two
chain lengths so the tunnel RTT cancels — see .claude/skills/verify/SKILL.md):

  scatter        plain table.at[ids].add (the round-2 sparse-SGD path)
  coalesce+hints coalesce_sparse_grad + sorted/unique scatter (adagrad path)
  onehot         dense_grad_auto one-hot MXU dense grad + dense add
  stream-sorted  stream_scatter_add on pre-sorted input (kernel-only cost)
  stream-full    lax.sort payload sort + stream_scatter_add (full pipeline)
  sort-only      the payload sort alone (pipeline cost decomposition)
  dma-sorted     dma_row_update on pre-coalesced input (kernel-only cost)
  dma-full       coalesce_sparse_grad + dma_row_update

Usage: python scripts/bench_stream_update.py [--dim 16] [--quick]
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
    """fn(state) -> state (same structure). Chain-slope ms per call."""
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
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rows", type=int, nargs="*", default=None)
    ap.add_argument("--batches", type=int, nargs="*", default=None)
    args = ap.parse_args()
    D = args.dim

    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        coalesce_sparse_grad,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
        onehot_dense_grad,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.stream_update import (
        dma_row_update,
        sort_sparse_grad,
        stream_scatter_add,
    )

    rows_list = args.rows or [20000, 93145, 286181, 2202608, 10131227]
    batch_list = args.batches or ([8192] if args.quick else [128, 2048, 8192])

    for R in rows_list:
        for B in batch_list:
            table0 = jax.random.normal(
                jax.random.PRNGKey(0), (R, D), jnp.float32
            )
            ids0 = jax.random.randint(
                jax.random.PRNGKey(1), (B,), 0, R, jnp.int32
            )
            vals0 = (
                jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.float32)
                * 1e-4
            )
            sids0 = jnp.sort(ids0)
            uids0, uvals0 = jax.jit(
                lambda i, v: coalesce_sparse_grad(i, v, R, B)
            )(ids0, vals0)
            jax.block_until_ready((table0, ids0, vals0, sids0, uids0))

            def next_ids(table, ids):
                salt = (table[0, 0] * 1e6).astype(jnp.int32)
                return (ids * 1103515245 + 12345 + salt) % R

            def next_sorted(table, ids):
                # keep sortedness: shift by a tiny table-dependent amount
                salt = (table[0, 0] * 1e4).astype(jnp.int32) % 3
                return jnp.clip(ids + salt, 0, R - 1)

            res = {}

            @jax.jit
            def s_plain(st):
                t, i = st
                t2 = t.at[i].add(vals0, mode="drop")
                return t2, next_ids(t2, i)

            res["scatter"], _ = chain_ms(s_plain, (table0, ids0))

            @jax.jit
            def s_coal(st):
                t, i = st
                u, uv = coalesce_sparse_grad(i, vals0, R, B)
                t2 = t.at[u].add(
                    uv, mode="drop", unique_indices=True,
                    indices_are_sorted=True,
                )
                return t2, next_ids(t2, i)

            res["coalesce+hints"], _ = chain_ms(s_coal, (table0, ids0))

            if R <= 300000:

                @jax.jit
                def s_oh(st):
                    t, i = st
                    dense = onehot_dense_grad(i, vals0, R)
                    t2 = t + dense
                    return t2, next_ids(t2, i)

                res["onehot"], _ = chain_ms(s_oh, (table0, ids0))

            @jax.jit
            def s_stream_sorted(st):
                t, i = st
                t2 = stream_scatter_add(t, i, vals0)
                return t2, next_sorted(t2, i)

            res["stream-sorted"], _ = chain_ms(
                s_stream_sorted, (table0, sids0)
            )

            @jax.jit
            def s_stream_full(st):
                t, i = st
                si, sv = sort_sparse_grad(i, vals0)
                t2 = stream_scatter_add(t, si, sv)
                return t2, next_ids(t2, i)

            res["stream-full"], _ = chain_ms(s_stream_full, (table0, ids0))

            @jax.jit
            def s_sort(st):
                t, i = st
                si, sv = sort_sparse_grad(i, vals0)
                t2 = t + 0.0 * sv[0, 0]
                return t2, next_ids(t2, i)

            res["sort-only"], _ = chain_ms(s_sort, (table0, ids0))

            if R % (128 // D if D <= 128 else 1) == 0:

                @jax.jit
                def s_dma_sorted(st):
                    t, i = st
                    t2 = dma_row_update(t, i, uvals0)
                    return t2, next_sorted(t2, i)

                res["dma-sorted"], _ = chain_ms(
                    s_dma_sorted, (table0, uids0)
                )

                @jax.jit
                def s_dma_full(st):
                    t, i = st
                    u, uv = coalesce_sparse_grad(i, vals0, R, B)
                    t2 = dma_row_update(t, u, uv)
                    return t2, next_ids(t2, i)

                res["dma-full"], _ = chain_ms(s_dma_full, (table0, ids0))

            print(f"rows={R} batch={B} dim={D}")
            for k, v in res.items():
                print(f"  {k:16s} {v:8.3f} ms  ({v * 1e6 / B:7.1f} ns/row)")
            del table0, ids0, vals0, sids0, uids0, uvals0


if __name__ == "__main__":
    main()
