"""Fused-mega-gather serving vs per-table gathers, slope-of-min-times.

Usage: python scripts/diag_serving4.py
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


def lat_ms(sfn, sb, n1=40, n2=120, reps=6):
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
    SB = 16384
    sb = jax.device_put(random_batch(scfg, SB, np.random.RandomState(2)))
    for name, kw in [("pertable", {}), ("fused", {"fused_gather": True}),
                     ("pertable2", {}), ("fused2", {"fused_gather": True})]:
        sfn = make_serving_fn(sm, **kw)
        lm = lat_ms(sfn, sb)
        print(json.dumps({
            "variant": name,
            "lat_ms": round(lm, 4),
            "preds_per_s": round(SB / (lm / 1e3)),
        }), flush=True)


if __name__ == "__main__":
    main()
