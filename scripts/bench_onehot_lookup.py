"""Microbenchmark: per-step embedding traffic — serial gather/scatter vs
one-hot MXU matmuls for small tables (honest chain-slope timing).

The sparse train step's cost is dominated by XLA's random-row gather
(~22 ns/row serial loop, measured 2026-08-19). For a table with n rows the
alternative is an MXU matmul against an on-the-fly one-hot matrix:
  forward:  pooled = counts[B, n] @ table[n, d]
  backward: d table = counts.T[n, B] @ g_pooled[B, d]   (dense update)
FLOP cost 2*B*n*d per direction — a win whenever the matmul time beats
B*P*22 ns, i.e. roughly n <= 30k at d=16.

Usage: python scripts/bench_onehot_lookup.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_quantized_recommendation_model_dqrm_tpu.config import kaggle_config

CFG = kaggle_config()
ONEHOT_MAX = 32768


def make_tables(key):
    ks = jax.random.split(key, len(CFG.table_sizes))
    return [
        jax.random.uniform(k, (n, CFG.embedding_dim), jnp.float32, -0.1, 0.1)
        for k, n in zip(ks, CFG.table_sizes)
    ]


def lookup_update_gather(tables, idx, g):
    """Current path: jnp.take gather + .at[].add scatter per table."""
    out = []
    new_tables = []
    for k, t in enumerate(tables):
        pooled = jnp.sum(jnp.take(t, idx[k], axis=0), axis=1)  # [B, D]
        out.append(pooled)
        new_tables.append(t.at[idx[k].reshape(-1)].add(
            -0.01 * jnp.broadcast_to(
                g[:, None, :], (g.shape[0], idx.shape[2], g.shape[1])
            ).reshape(-1, g.shape[1]),
            mode="drop",
        ))
    return new_tables, sum(out)


def lookup_update_onehot(tables, idx, g):
    """One-hot MXU for tables with n <= ONEHOT_MAX, gather for the rest."""
    out = []
    new_tables = []
    B, P = idx.shape[1], idx.shape[2]
    for k, t in enumerate(tables):
        n = t.shape[0]
        if n <= ONEHOT_MAX:
            # counts[B, n]: how many times each row appears in the bag
            oh = (idx[k][..., None] == jnp.arange(n, dtype=idx.dtype)).astype(
                jnp.float32
            )  # [B, P, n]
            counts = jnp.sum(oh, axis=1)  # [B, n]
            pooled = counts @ t
            out.append(pooled)
            new_tables.append(t - 0.01 * (counts.T @ g))
        else:
            pooled = jnp.sum(jnp.take(t, idx[k], axis=0), axis=1)
            out.append(pooled)
            new_tables.append(t.at[idx[k].reshape(-1)].add(
                -0.01 * jnp.broadcast_to(
                    g[:, None, :], (B, P, g.shape[1])
                ).reshape(-1, g.shape[1]),
                mode="drop",
            ))
    return new_tables, sum(out)


def slope(fn, tables, idx, g, n1=50, n2=150):
    step = jax.jit(fn, donate_argnums=(0,))
    tables, out = step(tables, idx, g)
    float(jnp.sum(out))

    def run(N, tb):
        t0 = time.perf_counter()
        for _ in range(N):
            tb, out = step(tb, idx, g)
        float(jnp.sum(out))
        return time.perf_counter() - t0, tb

    t1, tables = run(n1, tables)
    t2, tables = run(n2, tables)
    return (t2 - t1) / (n2 - n1)


def main():
    for B in (128, 8192):
        idx = jnp.asarray(
            np.stack([
                np.random.RandomState(7 + k).randint(0, n, size=(B, 1))
                for k, n in enumerate(CFG.table_sizes)
            ]).astype(np.int32)
        )
        g = jnp.asarray(
            np.random.RandomState(1).normal(
                size=(B, CFG.embedding_dim)
            ).astype(np.float32)
        )
        for name, fn in (
            ("gather", lookup_update_gather),
            ("onehot", lookup_update_onehot),
        ):
            tables = make_tables(jax.random.PRNGKey(0))
            s = slope(fn, tables, idx, g)
            n_small = sum(1 for n in CFG.table_sizes if n <= ONEHOT_MAX)
            print(f"B={B} {name}: {s*1e3:.3f} ms/step "
                  f"({n_small}/26 tables under one-hot threshold)",
                  flush=True)


if __name__ == "__main__":
    main()
