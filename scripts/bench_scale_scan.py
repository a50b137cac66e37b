"""On-chip cost attribution for the periodic scale scan (paper §3.2).

Times the k=16 megastep (bench.py configuration) at three scale-update
periods and the full-table min/max scan in isolation, to attribute the
per-iteration cost and check the scan against HBM speed-of-light
(v5e: 819 GB/s; the Kaggle FP32 model is 2.16 GB, so one fused min+max
pass has a ~2.6 ms floor).

Usage: python scripts/bench_scale_scan.py

TIMING CAVEAT (2026-08-19): the loops below time with
`jax.block_until_ready`, which on the axon tunneled backend returns at
ENQUEUE, not completion — absolute numbers this script printed before
2026-08-19 are host enqueue rates, not device compute. Before trusting a
re-run, port the timing to the chain-slope + forced-scalar-readback
pattern (see bench.py / .claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.config import (
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    TrainState,
    make_multi_train_step,
)

K, BATCH, NDISP = 16, 128, 25


def time_period(period: int) -> float:
    cfg = kaggle_config(
        QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                    scale_update_period=period)
    )
    tc = TrainConfig(batch_size=BATCH, learning_rate=0.1)
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(cfg, BATCH, rng)) for _ in range(K)]
    multi = make_multi_train_step(cfg, tc, K)
    state = TrainState(
        params=B._fast_device_init(cfg),
        opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    state, loss = multi(state, batches)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(NDISP):
            state, loss = multi(state, batches)
        jax.block_until_ready(loss)
        best = min(best, time.perf_counter() - t0)
    ms_it = best / (NDISP * K) * 1e3
    # steps crossed per repetition: NDISP*K; scans hit every `period`
    n_scans = (NDISP * K) // period if period <= NDISP * K else 0
    print(f"period={period:>10}: {ms_it:.4f} ms/it "
          f"({n_scans} scans per {NDISP * K}-step repetition)")
    return ms_it


def time_scan() -> float:
    cfg = kaggle_config(QuantConfig(enabled=True))
    params = B._fast_device_init(cfg)
    fn = jax.jit(lambda p: dlrm.compute_emb_scales(cfg, p))
    out = fn(params)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(params)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    gb = sum(int(np.prod(t.shape)) for t in params["emb"]) * 4 / 1e9
    print(f"full scan: {best * 1e3:.3f} ms for {gb:.2f} GB "
          f"=> {gb / best:.0f} GB/s effective")
    return best


if __name__ == "__main__":
    time_scan()
    for p in (200, 10**9):
        time_period(p)
