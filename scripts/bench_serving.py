"""Serving QPS/latency benchmark on the attached chip.

Measures the PTQ serving slice (SURVEY §7.8) end to end:
  1. steady-state bucketed throughput: ServingEngine at the largest bucket
     (predictions/s/chip), int8 MXU MLP path
  2. continuous batching under concurrency: MicroBatcher with many client
     threads issuing small requests — aggregate QPS + p50/p99 latency

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serving.py \
    [--bucket 16384] [--clients 16] [--req-size 32] [--cap 1000000]

TIMING CAVEAT (2026-08-19): the loops below time with
`jax.block_until_ready`, which on the axon tunneled backend returns at
ENQUEUE, not completion — absolute numbers this script printed before
2026-08-19 are host enqueue rates, not device compute. Before trusting a
re-run, port the timing to the chain-slope + forced-scalar-readback
pattern (see bench.py / .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import threading
import time

import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import kaggle_config
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.serving import (
    MicroBatcher,
    ServingEngine,
    ptq_export,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=16384)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--req-size", type=int, default=32)
    ap.add_argument("--reqs-per-client", type=int, default=40)
    ap.add_argument("--cap", type=int, default=1_000_000,
                    help="cap table rows (packing happens host-side)")
    args = ap.parse_args()

    cfg = kaggle_config()
    cfg = dataclasses.replace(
        cfg, table_sizes=tuple(min(n, args.cap) for n in cfg.table_sizes)
    )
    params = dlrm.init_params(cfg, seed=0)
    sm = ptq_export(cfg, params, emb_bits=4, mlp_bits=8)
    eng = ServingEngine(sm, buckets=(args.req_size * 4, args.bucket))
    rng = np.random.RandomState(0)

    def make_req(n):
        dense = rng.rand(n, cfg.num_dense).astype(np.float32)
        idx = np.stack(
            [rng.randint(0, t, size=(n, 1)).astype(np.int32) for t in cfg.table_sizes]
        )
        return dense, idx

    # 0) device-resident compute capability (no host<->device transfer):
    # on the tunneled axon setup the e2e numbers below are transport-bound
    # (~15 MB/s upload, ~34 ms readback — measured 2026-08-18); this is the
    # number a production host (local PCIe) would approach.
    import jax

    from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch

    dense, idx = make_req(args.bucket)
    dev_batch = jax.device_put(
        Batch(dense=dense, indices=idx,
              labels=np.zeros((args.bucket,), np.float32), mask=None)
    )
    out = eng.fn(dev_batch)
    jax.block_until_ready(out)
    n_iter = 50
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = eng.fn(dev_batch)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    print(
        f"device-resident bucket={args.bucket}: {best * 1e3:.3f} ms/batch "
        f"=> {args.bucket / best:,.0f} predictions/s/chip"
    )

    # 1) steady-state bucket throughput, end to end (host arrays in/out)
    eng.predict(dense, idx)  # warmup/compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        eng.predict(dense, idx)
    dt = time.perf_counter() - t0
    qps_bulk = n_iter * args.bucket / dt
    print(
        f"bulk e2e bucket={args.bucket}: {dt / n_iter * 1e3:.3f} ms/batch "
        f"=> {qps_bulk:,.0f} predictions/s/chip"
    )

    # 2) continuous batching under concurrent small requests
    mb = MicroBatcher(eng, max_batch=args.bucket, max_wait_ms=0.5)
    reqs = [make_req(args.req_size) for _ in range(8)]
    mb.predict(*reqs[0])  # warmup the small bucket
    lat: list = []
    lock = threading.Lock()

    def client(i):
        r = reqs[i % len(reqs)]
        mine = []
        for _ in range(args.reqs_per_client):
            t0 = time.perf_counter()
            mb.predict(*r)
            mine.append(time.perf_counter() - t0)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    mb.close()
    lat_ms = np.array(lat) * 1e3
    total_preds = args.clients * args.reqs_per_client * args.req_size
    print(
        f"microbatch clients={args.clients} req={args.req_size}: "
        f"{total_preds / wall:,.0f} predictions/s | latency p50 "
        f"{np.percentile(lat_ms, 50):.2f} ms p99 {np.percentile(lat_ms, 99):.2f} ms"
    )


if __name__ == "__main__":
    main()
