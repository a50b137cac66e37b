"""Serving benchmark: INT4 packed Kaggle model, QPS per chip.

Measures the PTQ inference path (bit-packed tables + int8 MLP) at the
reference's test batch size. Prints one JSON line per configuration.

Methodology: on the tunneled TPU backend `block_until_ready` returns at
ENQUEUE (see .claude/skills/verify/SKILL.md), so each iteration's input
carries a data dependency on the previous output (forcing on-device
serialization), the chain ends with one scalar readback, and the reported
latency is the SLOPE between two chain lengths (readback RTT cancels).

Usage: python tools/bench_serving.py [--batch 16384] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _sustained_latency_s(fn, batch, n1: int, n2: int, reps: int = 6) -> float:
    """Per-call latency via chained dispatches + one readback, slope of the
    MIN chain times over `reps` repeats (chain-time noise is strictly
    positive-additive, so the minima converge on the clean runs; a single
    pair's slope is stall-biased — see bench._serving_preds_per_s).
    `fn(batch) -> scores [B]`; the next call's dense input adds scores[0]*0
    so the chain is data-dependent end to end."""
    import jax.numpy as jnp

    def run(n):
        b = batch
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = fn(b)
            b = b._replace(dense=batch.dense + y[0] * 0.0)
        float(jnp.sum(y))  # forces completion of the whole chain
        return time.perf_counter() - t0

    run(2)  # warm both input shapes/specializations
    run(3)  # drain
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--emb-bits", type=int, default=4)
    ap.add_argument("--onehot-sweep", type=str, default="",
                    help="comma list of onehot_lookup_max_rows thresholds "
                         "to sweep (e.g. 0,1500,6000,15000,100000)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from deep_quantized_recommendation_model_dqrm_tpu.config import kaggle_config
    from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
    from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch
    from deep_quantized_recommendation_model_dqrm_tpu.serving import (
        make_serving_fn,
        ptq_export,
        serving_model_bytes,
    )

    cfg = kaggle_config()
    params = dlrm.init_params(cfg, seed=0)
    sm = ptq_export(cfg, params, emb_bits=args.emb_bits, mlp_bits=8)
    fp32_bytes = sum(t.size * 4 for t in params["emb"]) + sum(
        (l["w"].size + l["b"].size) * 4
        for part in ("bot", "top")
        for l in params[part]
    )
    print(
        json.dumps(
            {
                "metric": "model_bytes",
                "value": serving_model_bytes(sm),
                "unit": "bytes",
                "vs_baseline": round(fp32_bytes / serving_model_bytes(sm), 2),
            }
        ),
        flush=True,
    )
    del params

    rng = np.random.RandomState(0)
    B = args.batch
    import jax.numpy as jnp

    batch = Batch(
        dense=jnp.asarray(rng.rand(B, 13).astype(np.float32)),
        indices=jnp.asarray(
            np.stack(
                [rng.randint(0, n, size=(B, 1)).astype(np.int32) for n in cfg.table_sizes]
            )
        ),
        labels=jnp.zeros((B,), jnp.float32),
        mask=None,
    )
    n1, n2 = max(args.iters // 3, 5), args.iters
    onehot_sweep = (
        [int(x) for x in args.onehot_sweep.split(",")]
        if args.onehot_sweep
        else [0]
    )
    for impl in ("xla", "int8"):
        for oh in onehot_sweep:
            f = make_serving_fn(sm, mlp_impl=impl,
                                onehot_lookup_max_rows=oh)
            dt = _sustained_latency_s(f, batch, n1, n2)
            print(
                json.dumps(
                    {
                        "metric": f"serving_qps_per_chip_{impl}_oh{oh}",
                        "value": round(B / dt),
                        "unit": f"predictions/s (batch {B}, "
                                f"INT{args.emb_bits} emb, mlp_impl={impl}, "
                                f"onehot_lookup_max_rows={oh})",
                        "latency_ms": round(dt * 1e3, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
