"""Serving-latency diagnostics (round 5, VERDICT r4 #1) — one tool, four
experiments. These produced the estimator + spread findings recorded in
bench._serving_preds_per_s / PARITY.md "Serving estimator + spread":

  slopes     slope DISTRIBUTION across chain-length pairs: shows raw
             pair-slopes wandering 1.6-4.8 ms and why min-of-slopes is
             stall-biased HIGH (a stall in the SHORT chain shrinks that
             pair's slope; the min then selects the most-stalled pair)
  estimator  slope-of-MIN-chain-times vs min-of-slopes side by side
             (chain-time noise is positive-additive, so minima converge
             on the clean run)
  batch      batch-size scaling: B=16384 optimal, 32768 ties, >=65536
             REGRESSES — nothing left to amortize past the serial gather
  fused      per-table gathers vs ONE fused mega-gather: fused is 3x
             WORSE (small tables lose gather locality inside the big
             array) — make_serving_fn(fused_gather=True) stays off

Usage: python scripts/diag_serving.py {slopes|estimator|batch|fused}
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


def _setup():
    scfg = kaggle_config(QuantConfig(enabled=True, embedding_bit=4, weight_bit=4))
    sparams = _fast_device_init(scfg)
    sm = ptq_export(scfg, sparams, emb_bits=4, mlp_bits=8)
    for t in sparams["emb"]:
        if hasattr(t, "delete"):
            t.delete()
    return scfg, sm


def _runner(sfn, sb):
    import jax.numpy as jnp

    def srun(n):
        b = sb
        y = None
        t0 = time.perf_counter()
        for _ in range(n):
            y = sfn(b)
            b = b._replace(dense=sb.dense + y[0] * 0.0)
        float(jnp.sum(y))  # forces completion of the whole chain
        return time.perf_counter() - t0

    return srun


def _lat_minmin(srun, n1, n2, reps):
    srun(2)
    srun(3)
    t1 = min(srun(n1) for _ in range(reps))
    t2 = min(srun(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1) * 1e3


def cmd_slopes():
    scfg, sm = _setup()
    SB = 16384
    srun = _runner(make_serving_fn(sm),
                   jax.device_put(random_batch(scfg, SB, np.random.RandomState(2))))
    srun(2); srun(3); srun(3)
    for (n1, n2) in [(10, 30), (30, 90), (50, 150), (100, 300)]:
        slopes = []
        for _ in range(7):
            t1, t2 = srun(n1), srun(n2)
            slopes.append(round((t2 - t1) / (n2 - n1) * 1e3, 4))
        arr = np.array(slopes)
        print(json.dumps({
            f"{n1}/{n2}": {
                "slopes_ms": slopes,
                "min": round(float(arr.min()), 4),
                "median": round(float(np.median(arr)), 4),
                "preds_min_lat": round(SB / (arr.min() / 1e3)),
                "preds_median_lat": round(SB / (np.median(arr) / 1e3)),
            }
        }), flush=True)


def cmd_estimator():
    scfg, sm = _setup()
    SB = 16384
    srun = _runner(make_serving_fn(sm),
                   jax.device_put(random_batch(scfg, SB, np.random.RandomState(2))))
    srun(2); srun(3); srun(3)
    n1, n2 = 40, 120
    t1s = np.array([srun(n1) for _ in range(8)])
    t2s = np.array([srun(n2) for _ in range(8)])
    lat_mm = (t2s.min() - t1s.min()) / (n2 - n1) * 1e3
    slopes = (t2s - t1s) / (n2 - n1) * 1e3
    print(json.dumps({
        "lat_slope_of_mins_ms": round(float(lat_mm), 4),
        "preds_slope_of_mins": round(SB / (lat_mm / 1e3)),
        "min_of_slopes_ms": round(float(slopes.min()), 4),
        "median_of_slopes_ms": round(float(np.median(slopes)), 4),
    }), flush=True)


def cmd_batch():
    scfg, sm = _setup()
    sfn = make_serving_fn(sm)
    for SB, (n1, n2, reps) in [
        (16384, (40, 120, 5)), (32768, (20, 60, 5)),
        (65536, (10, 30, 5)), (131072, (6, 18, 5)),
    ]:
        sb = jax.device_put(random_batch(scfg, SB, np.random.RandomState(2)))
        lm = _lat_minmin(_runner(sfn, sb), n1, n2, reps)
        print(json.dumps({"batch": SB, "lat_ms": round(lm, 4),
                          "preds_per_s": round(SB / (lm / 1e3))}), flush=True)
        for leaf in sb:
            if hasattr(leaf, "delete"):
                leaf.delete()


def cmd_fused():
    scfg, sm = _setup()
    SB = 16384
    sb = jax.device_put(random_batch(scfg, SB, np.random.RandomState(2)))
    for name, kw in [("pertable", {}), ("fused", {"fused_gather": True}),
                     ("pertable2", {}), ("fused2", {"fused_gather": True})]:
        lm = _lat_minmin(_runner(make_serving_fn(sm, **kw), sb), 40, 120, 6)
        print(json.dumps({"variant": name, "lat_ms": round(lm, 4),
                          "preds_per_s": round(SB / (lm / 1e3))}), flush=True)


if __name__ == "__main__":
    {"slopes": cmd_slopes, "estimator": cmd_estimator,
     "batch": cmd_batch, "fused": cmd_fused}[
        sys.argv[1] if len(sys.argv) > 1 else "estimator"
    ]()
