"""Serving-slope distribution diagnostic (VERDICT r4 #1).

BENCH_r04 captured 6.31M preds/s while the repo claimed 10.03M (best-of-3
MIN-latency over N=10/30 chains). Hypotheses:
  (a) short chains (~40 ms slope window) are tunnel-jitter dominated;
  (b) min-of-slopes is biased HIGH: a stall in the SHORT chain inflates t1,
      shrinks the slope, and reads as impossibly low latency (same artifact
      class as the round-3 Terabyte pre-drain discovery).

This script measures the slope DISTRIBUTION across chain-length pairs and
repeats so we can pick a driver-reproducible estimator (long chains +
median).

Usage: python scripts/diag_serving.py  (real chip, ~2 min)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from bench import _fast_device_init  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.serving import (  # noqa: E402
    make_serving_fn,
    ptq_export,
)


def main() -> None:
    import jax.numpy as jnp

    scfg = kaggle_config(QuantConfig(enabled=True, embedding_bit=4, weight_bit=4))
    sparams = _fast_device_init(scfg)
    sm = ptq_export(scfg, sparams, emb_bits=4, mlp_bits=8)
    for t in sparams["emb"]:
        if hasattr(t, "delete"):
            t.delete()
    sfn = make_serving_fn(sm)
    SB = 16384
    sb = jax.device_put(random_batch(scfg, SB, np.random.RandomState(2)))

    def srun(n):
        b = sb
        y = None
        t0 = time.perf_counter()
        for _ in range(n):
            y = sfn(b)
            b = b._replace(dense=sb.dense + y[0] * 0.0)
        float(jnp.sum(y))
        return time.perf_counter() - t0

    srun(2)  # warm
    srun(3)  # drain
    srun(3)  # drain again

    results = {}
    for (n1, n2) in [(10, 30), (30, 90), (50, 150), (100, 300)]:
        slopes = []
        for _ in range(7):
            t1 = srun(n1)
            t2 = srun(n2)
            lat_ms = (t2 - t1) / (n2 - n1) * 1e3
            slopes.append(round(lat_ms, 4))
        arr = np.array(slopes)
        results[f"{n1}/{n2}"] = {
            "slopes_ms": slopes,
            "min": round(float(arr.min()), 4),
            "median": round(float(np.median(arr)), 4),
            "max": round(float(arr.max()), 4),
            "preds_min_lat": round(SB / (arr.min() / 1e3)),
            "preds_median_lat": round(SB / (np.median(arr) / 1e3)),
        }
        print(json.dumps({f"{n1}/{n2}": results[f"{n1}/{n2}"]}), flush=True)

    # direct long-run average as a cross-check (includes dispatch overhead
    # amortized over 300 calls; readback RTT /300 is negligible)
    t300 = srun(300)
    print(json.dumps({"direct_300_ms_per_call": round(t300 / 300 * 1e3, 4),
                      "preds": round(SB / (t300 / 300))}), flush=True)


if __name__ == "__main__":
    main()
