"""Serving benchmark: INT4 packed Kaggle model, QPS per chip.

Measures the PTQ inference path (bit-packed tables + int8 MLP) at the
reference's test batch size. Prints one JSON line per configuration.

Usage: python tools/bench_serving.py [--batch 16384] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--emb-bits", type=int, default=4)
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

    fns = {impl: make_serving_fn(sm, mlp_impl=impl)
           for impl in ("xla", "int8")}
    fn = fns["xla"]
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
    t0 = time.time()
    fn(batch).block_until_ready()
    print(f"# compile+first run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ys = [fn(batch) for _ in range(args.iters)]
    jax.block_until_ready(ys)
    dt = (time.perf_counter() - t0) / args.iters
    qps = B / dt
    print(
        json.dumps(
            {
                "metric": "serving_qps_per_chip",
                "value": round(qps),
                "unit": f"predictions/s (batch {B}, INT{args.emb_bits} emb, INT8 mlp)",
                "vs_baseline": None,
                "latency_ms": round(dt * 1e3, 3),
            }
        ),
        flush=True,
    )


    for impl, f in fns.items():
        f(batch).block_until_ready()
        t0 = time.perf_counter()
        ys = [f(batch) for _ in range(args.iters)]
        jax.block_until_ready(ys)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "metric": f"serving_qps_per_chip_{impl}",
                    "value": round(args.batch / dt),
                    "unit": f"predictions/s (batch {args.batch}, mlp_impl={impl})",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
