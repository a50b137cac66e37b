"""Microbenchmark: XLA scatter codegen variants at large table sizes.

bench_dedupe_scatter.py showed index hints reach gather parity (7.3 ns/row)
at 205k-row tables but do nothing at 2M+ rows, where every scatter variant
sits at ~100 ns/row. Hypothesis: the read-modify-write scatter is the
problem, and a gather + add + WRITE-ONLY scatter (`.set` with unique
indices) can run at ~2-3x gather cost instead.

Variants per (n, R), ids unique+sorted (host-dedupe regime, OOB padding):
  gather   — rows = table[ids]                       (the known-fast floor)
  add      — table.at[ids].add(vals, hints)          (today's RMW scatter)
  set      — table.at[ids].set(vals, hints)          (write-only scatter)
  gas      — table.at[ids].set(table[ids] + vals)    (the candidate update)

Honest chain-slope methodology (README "benchmark methodology").

Usage (real TPU): python scripts/bench_scatter_codegen.py [d]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HINTS = dict(unique_indices=True, indices_are_sorted=True, mode="drop")


def slope(fn, table, args, n1, n2):
    table = fn(table, *args)
    float(jnp.sum(table[0]))

    def run(N, t):
        t0 = time.perf_counter()
        for _ in range(N):
            t = fn(t, *args)
        float(jnp.sum(t[0]))
        return time.perf_counter() - t0, t

    t1, table = run(n1, table)
    t2, table = run(n2, table)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    print(f"d={d}  (ms per op; ids unique+sorted w/ OOB padding)")
    print(f"{'n':>9} {'R':>7} {'U':>7} {'gather':>9} {'add':>9} "
          f"{'set':>9} {'gas':>9} {'add/gas':>8}")

    def gather(t, ids, vals):
        rows = jnp.take(t, jnp.minimum(ids, t.shape[0] - 1), axis=0)
        # keep the chain state-dependent at negligible cost
        return t.at[0, 0].add(rows[0, 0] * 1e-30)

    def add(t, ids, vals):
        return t.at[ids].add(vals, **HINTS)

    def set_(t, ids, vals):
        return t.at[ids].set(vals, **HINTS)

    def gas(t, ids, vals):
        rows = jnp.take(t, jnp.minimum(ids, t.shape[0] - 1), axis=0)
        return t.at[ids].set(rows + vals, **HINTS)

    jit = lambda f: jax.jit(f, donate_argnums=(0,))
    f_g, f_a, f_s, f_gas = map(jit, (gather, add, set_, gas))

    key = jax.random.PRNGKey(0)
    mk_table = jax.jit(
        lambda k, n: jax.random.normal(k, (n, d)), static_argnums=(1,))

    for n in (205_000, 2_000_000, 10_000_000):
        for R in (8192, 212_992):
            raw = rng.randint(0, n, size=R).astype(np.int32)
            uids = np.unique(raw)
            U = len(uids)
            ids_np = (n + np.arange(R)).astype(np.int32)
            ids_np[:U] = uids
            ids = jnp.asarray(ids_np)
            vals = jnp.asarray(
                rng.normal(size=(R, d)).astype(np.float32) * 1e-4)

            # correctness: gas == add on unique ids
            t0 = jnp.zeros((n, d), jnp.float32)
            want = np.asarray(add(t0, ids, vals))
            got = np.asarray(gas(jnp.zeros((n, d), jnp.float32), ids, vals))
            assert float(np.abs(got - want).max()) < 1e-7

            n1, n2 = (64, 192) if R <= 8192 else (8, 24)
            ms_g = slope(f_g, mk_table(key, n), (ids, vals), n1, n2)
            ms_a = slope(f_a, mk_table(key, n), (ids, vals), n1, n2)
            ms_s = slope(f_s, mk_table(key, n), (ids, vals), n1, n2)
            ms_x = slope(f_gas, mk_table(key, n), (ids, vals), n1, n2)
            print(f"{n:>9} {R:>7} {U:>7} {ms_g:>9.4f} {ms_a:>9.4f} "
                  f"{ms_s:>9.4f} {ms_x:>9.4f} {ms_a/ms_x:>7.2f}x", flush=True)


if __name__ == "__main__":
    main()
