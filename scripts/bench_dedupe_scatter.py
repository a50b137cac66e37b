"""Microbenchmark: can host-side dedupe beat the XLA scatter-add bottleneck?

The characterized training bottleneck (README "where the time goes") is the
embedding scatter-add: 34 ns/row read-modify-write vs 7.4 ns/row for the
gather. On-device sort+coalesce was measured SLOWER (jnp.sort costs more
than it saves). This bench tests the remaining idea from the open thread:
dedupe on the HOST (np.unique rides in the prefetch pipeline, overlapped
with device compute), so the device sees

  (sorted unique ids padded to a static cap with out-of-range sentinels,
   a permutation sorting occurrences by id,
   sorted segment ids for the occurrences)

and the update becomes

  vals_sorted = vals[perm]                         # [R,d] gather (small)
  summed = segment_sum(vals_sorted, seg_sorted,    # sorted segment reduce
                       num_segments=U_cap, indices_are_sorted=True)
  table.at[uids_pad].add(summed, unique_indices=True,
                         indices_are_sorted=True, mode="drop")

Variants measured per (n rows, R occurrences):
  A plain      — table.at[ids].add(vals)                  (today's path)
  B flags-only — scatter R unique sorted ids w/ hint flags (upper bound of
                 the scatter-side win, pre-summed values)
  C sorted-dup — duplicate ids, sorted, indices_are_sorted (sortedness alone)
  D pipeline   — the full dedupe update above              (the candidate)

Honest chain-slope methodology (README "benchmark methodology").

Usage (real TPU): python scripts/bench_dedupe_scatter.py [d] [zipf_a]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, table, args, n1=16, n2=48):
    """ms per update, chain-slope with forced readback."""
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


def host_dedupe(ids_np, n):
    """What the data loader would precompute per table per batch."""
    uids, inverse, counts = np.unique(
        ids_np, return_inverse=True, return_counts=True)
    perm = np.argsort(ids_np, kind="stable")
    seg_sorted = inverse[perm]  # nondecreasing
    cap = len(ids_np)
    U = len(uids)
    # distinct out-of-range padding so the padded list is truly unique+sorted
    uids_pad = (n + np.arange(cap)).astype(np.int32)
    uids_pad[:U] = uids
    # segment boundaries for the cumsum-diff variant: sum of sorted rows
    # [starts[u], ends[u]] == zcsum[ends[u]+1] - zcsum[starts[u]]
    ends = np.zeros(cap, np.int32)  # padding: ends+1 == starts -> zero row
    starts = np.ones(cap, np.int32)
    ends[:U] = np.cumsum(counts) - 1
    starts[:U] = ends[:U] - counts + 1
    return (
        jnp.asarray(uids_pad),
        jnp.asarray(perm.astype(np.int32)),
        jnp.asarray(seg_sorted.astype(np.int32)),
        jnp.asarray(starts),
        jnp.asarray(ends),
        U,
    )


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    zipf_a = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    rng = np.random.RandomState(0)
    print(f"d={d} zipf_a={zipf_a or 'uniform'}  (ms per table update)")
    print(f"{'n':>9} {'R':>7} {'U':>7} {'A plain':>9} {'B flags':>9} "
          f"{'C sorted':>9} {'D segsum':>9} {'E cumsum':>9} {'A/E':>6}")

    def plain(t, ids, vals):
        return t.at[ids].add(vals, mode="drop")

    def flags(t, uids_pad, summed):
        return t.at[uids_pad].add(
            summed, unique_indices=True, indices_are_sorted=True, mode="drop")

    def sorted_dup(t, sids, vals):
        return t.at[sids].add(vals, indices_are_sorted=True, mode="drop")

    def pipeline(t, uids_pad, perm, seg, vals):
        vs = vals[perm]
        summed = jax.ops.segment_sum(
            vs, seg, num_segments=uids_pad.shape[0], indices_are_sorted=True)
        return t.at[uids_pad].add(
            summed, unique_indices=True, indices_are_sorted=True, mode="drop")

    def cumsum_pipe(t, uids_pad, perm, starts, ends, vals):
        vs = vals[perm]
        zcsum = jnp.concatenate(
            [jnp.zeros((1, vs.shape[-1]), vs.dtype), jnp.cumsum(vs, axis=0)])
        summed = zcsum[ends + 1] - zcsum[starts]
        return t.at[uids_pad].add(
            summed, unique_indices=True, indices_are_sorted=True, mode="drop")

    jit = lambda f: jax.jit(f, donate_argnums=(0,))
    f_plain, f_flags, f_sorted, f_pipe, f_csum = map(
        jit, (plain, flags, sorted_dup, pipeline, cumsum_pipe))

    key = jax.random.PRNGKey(0)
    mk_table = jax.jit(
        lambda k, n: jax.random.normal(k, (n, d)), static_argnums=(1,))

    for n in (205_000, 2_000_000, 10_000_000):
        for R in (8192, 212_992):  # one table @B=8192; 26-table aggregate
            if zipf_a > 0:
                raw = rng.zipf(zipf_a, size=R).astype(np.int64) - 1
                ids_np = (raw % n).astype(np.int32)
            else:
                ids_np = rng.randint(0, n, size=R).astype(np.int32)
            vals_np = rng.normal(size=(R, d)).astype(np.float32) * 1e-4
            uids_pad, perm, seg, starts, ends, U = host_dedupe(ids_np, n)
            ids = jnp.asarray(ids_np)
            sids = jnp.asarray(np.sort(ids_np))
            vals = jnp.asarray(vals_np)

            # correctness of the two dedupe pipelines vs the plain scatter
            t0 = jnp.zeros((n, d), jnp.float32)
            want = np.zeros((n, d), np.float32)
            np.add.at(want, ids_np, vals_np)
            got_d = np.asarray(pipeline(t0, uids_pad, perm, seg, vals))
            got_e = np.asarray(
                cumsum_pipe(t0, uids_pad, perm, starts, ends, vals))
            err_d = float(np.abs(got_d - want).max())
            err_e = float(np.abs(got_e - want).max())
            assert err_d < 1e-6, err_d

            n1, n2 = (64, 192) if R <= 8192 else (8, 24)
            ms_a = slope(f_plain, mk_table(key, n), (ids, vals), n1, n2)
            ms_b = slope(f_flags, mk_table(key, n), (uids_pad, vals), n1, n2)
            ms_c = slope(f_sorted, mk_table(key, n), (sids, vals), n1, n2)
            ms_d = slope(
                f_pipe, mk_table(key, n), (uids_pad, perm, seg, vals), n1, n2)
            ms_e = slope(
                f_csum, mk_table(key, n),
                (uids_pad, perm, starts, ends, vals), n1, n2)
            print(f"{n:>9} {R:>7} {U:>7} {ms_a:>9.4f} {ms_b:>9.4f} "
                  f"{ms_c:>9.4f} {ms_d:>9.4f} {ms_e:>9.4f} "
                  f"{ms_a/ms_e:>5.2f}x  cerr={err_e:.2e}", flush=True)


if __name__ == "__main__":
    main()
