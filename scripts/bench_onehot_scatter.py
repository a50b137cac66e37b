"""Microbenchmark: scatter-add table update vs the MXU one-hot dense-grad
kernel (ops/pallas/onehot_update.py), per table size n and occurrence count R.

Honest chain-slope methodology (README "benchmark methodology"): chain N
state-dependent dispatches, force ONE scalar readback, take the slope between
two N values so the tunnel RTT cancels.

Usage (real TPU): python scripts/bench_onehot_scatter.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
    onehot_dense_grad,
)


def scatter_step(table, ids, vals):
    return table.at[ids].add(vals, mode="drop")


def onehot_step(table, ids, vals):
    return table - onehot_dense_grad(ids, vals, table.shape[0])


def slope(step, table, ids, vals, n1=64, n2=192):
    """ms per update, chain-slope with forced readback."""
    fn = jax.jit(step, donate_argnums=(0,))
    table = fn(table, ids, vals)
    float(jnp.sum(table[0]))

    def run(N, t):
        t0 = time.perf_counter()
        for _ in range(N):
            t = fn(t, ids, vals)
        float(jnp.sum(t[0]))
        return time.perf_counter() - t0, t

    t1, table = run(n1, table)
    t2, table = run(n2, table)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    print(f"d={d}  (ms per table update)")
    print(f"{'n':>8} {'R':>7} {'scatter':>9} {'onehot':>9} {'speedup':>8}")
    for n in (512, 2048, 8192, 16384, 32768, 65536):
        for R in (128, 2048, 8192):
            ids = jnp.asarray(rng.randint(0, n, size=R).astype(np.int32))
            vals = jnp.asarray(rng.normal(size=(R, d)).astype(np.float32) * 1e-4)
            tnp = rng.normal(size=(n, d)).astype(np.float32)
            ms_sc = slope(scatter_step, jnp.asarray(tnp), ids, vals)
            ms_oh = slope(onehot_step, jnp.asarray(tnp), ids, vals)
            print(f"{n:>8} {R:>7} {ms_sc:>9.4f} {ms_oh:>9.4f} "
                  f"{ms_sc/ms_oh:>8.2f}x", flush=True)


if __name__ == "__main__":
    main()
