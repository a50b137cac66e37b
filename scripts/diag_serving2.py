"""Serving estimator comparison: slope-of-min-times vs min-of-slopes.

Chain-TIME noise on the tunnel is strictly positive-additive (stalls only
ever ADD time), so min-over-repeats of each chain time approximates the
clean run, and the slope of the two minima is a robust latency estimate.
min-of-SLOPES by contrast is biased LOW (a stall landing in the short
chain shrinks the slope) — the same artifact class as the round-3
Terabyte discovery, which is how the 10.03M claim outran the 6.31M
driver capture.

Usage: python scripts/diag_serving2.py
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

    srun(2)
    srun(3)
    srun(3)

    n1, n2 = 40, 120
    t1s, t2s = [], []
    for _ in range(8):
        t1s.append(srun(n1))
        t2s.append(srun(n2))
    t1s, t2s = np.array(t1s), np.array(t2s)
    lat_minmin = (t2s.min() - t1s.min()) / (n2 - n1) * 1e3
    slopes = (t2s - t1s) / (n2 - n1) * 1e3
    print(json.dumps({
        "t1_s": [round(x, 4) for x in t1s.tolist()],
        "t2_s": [round(x, 4) for x in t2s.tolist()],
        "lat_slope_of_mins_ms": round(float(lat_minmin), 4),
        "preds_slope_of_mins": round(SB / (lat_minmin / 1e3)),
        "paired_slopes_ms": [round(float(s), 4) for s in slopes],
        "min_of_slopes_ms": round(float(slopes.min()), 4),
        "median_of_slopes_ms": round(float(np.median(slopes)), 4),
    }), flush=True)

    # repeat the whole experiment once more for run-to-run stability
    t1s2 = np.array([srun(n1) for _ in range(4)])
    t2s2 = np.array([srun(n2) for _ in range(4)])
    lat2 = (t2s2.min() - t1s2.min()) / (n2 - n1) * 1e3
    print(json.dumps({
        "repeat_lat_slope_of_mins_ms": round(float(lat2), 4),
        "repeat_preds": round(SB / (lat2 / 1e3)),
        "repeat_t1_min": round(float(t1s2.min()), 4),
        "repeat_t2_min": round(float(t2s2.min()), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
