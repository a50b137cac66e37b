"""Serving batch-size scaling: does B>16384 lift preds/s past the gather
wall? Slope-of-min-times estimator (see diag_serving2.py).

Usage: python scripts/diag_serving3.py
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


def lat_ms(sfn, sb, n1, n2, reps):
    import jax.numpy as jnp

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
    t1 = min(srun(n1) for _ in range(reps))
    t2 = min(srun(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1) * 1e3


def main() -> None:
    scfg = kaggle_config(QuantConfig(enabled=True, embedding_bit=4, weight_bit=4))
    sparams = _fast_device_init(scfg)
    sm = ptq_export(scfg, sparams, emb_bits=4, mlp_bits=8)
    for t in sparams["emb"]:
        if hasattr(t, "delete"):
            t.delete()
    sfn = make_serving_fn(sm)
    for SB, (n1, n2, reps) in [
        (16384, (40, 120, 5)),
        (32768, (20, 60, 5)),
        (65536, (10, 30, 5)),
        (131072, (6, 18, 5)),
    ]:
        sb = jax.device_put(random_batch(scfg, SB, np.random.RandomState(2)))
        lm = lat_ms(sfn, sb, n1, n2, reps)
        print(json.dumps({
            "batch": SB,
            "lat_ms": round(lm, 4),
            "preds_per_s": round(SB / (lm / 1e3)),
        }), flush=True)
        for leaf in sb:
            if hasattr(leaf, "delete"):
                leaf.delete()


if __name__ == "__main__":
    main()
