"""Train-step throughput sweep: scatter/gather vs MXU one-hot thresholds.

Measures the Kaggle INT4 QAT sparse megastep (bench.py methodology:
chain-slope + forced readback) across batch sizes and one-hot thresholds
(TrainConfig.onehot_update_max_rows x DLRMConfig.onehot_lookup_max_rows).

Usage (real TPU): python scripts/bench_train_throughput.py [k]
"""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fast_device_init, sustained_ms_per_it  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    make_multi_train_step,
)


def measure(B, k, upd_max, lkp_max, n1=8, n2=24):
    import dataclasses

    cfg = dataclasses.replace(
        kaggle_config(
            QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        scale_update_period=200)
        ),
        onehot_lookup_max_rows=lkp_max,
    )
    tc = TrainConfig(batch_size=B, learning_rate=0.1,
                     onehot_update_max_rows=upd_max)
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(cfg, B, rng)) for _ in range(k)]
    multi = make_multi_train_step(cfg, tc, k, sparse_emb_grad=True)
    state = TrainState(params=_fast_device_init(cfg), opt_state=None,
                       qstate=dlrm.init_quant_state(cfg))
    ms, _ = sustained_ms_per_it(multi, state, batches, k, n1=n1, n2=n2)
    return ms


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_small = {
        t: sum(1 for n in kaggle_config().table_sizes if n <= t)
        for t in (4096, 16384, 32768)
    }
    print(f"kaggle tables under threshold: {n_small}", flush=True)
    print(f"{'B':>6} {'upd_max':>8} {'lkp_max':>8} {'ms/it':>8} "
          f"{'samples/s':>11}", flush=True)
    for B in (128, 8192):
        n1, n2 = (25, 75) if B == 128 else (8, 24)
        for upd_max, lkp_max in (
            (0, 0),
            (16384, 0),
            (32768, 0),
            (16384, 4096),
            (32768, 16384),
        ):
            ms = measure(B, k, upd_max, lkp_max, n1=n1, n2=n2)
            print(f"{B:>6} {upd_max:>8} {lkp_max:>8} {ms:>8.3f} "
                  f"{B / ms * 1e3:>11.0f}", flush=True)


if __name__ == "__main__":
    main()
