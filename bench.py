"""Headline benchmark: Criteo-Kaggle DQRM INT4 QAT training step on one chip.

Prints ONE JSON line:
  {"metric": "qat_train_step_ms", "value": <ms/it>, "unit": "ms",
   "vs_baseline": <baseline_ms / ours_ms>}

Baseline: the reference's single-device Kaggle DQRM INT4 at 22 ms/it
(paper Table 3a, 1x A5000, batch 128 — BASELINE.md). vs_baseline > 1 means
faster than the reference.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_train_step,
)

BASELINE_MS = 22.0  # paper Table 3a: DQRM INT4 Kaggle, 22 ms/it on A5000
BATCH = 128  # README Kaggle recipe --mini-batch-size=128


def main() -> None:
    cfg = kaggle_config(
        QuantConfig(enabled=True, embedding_bit=4, weight_bit=4, scale_update_period=200)
    )
    tc = TrainConfig(batch_size=BATCH, learning_rate=0.1)

    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)

    rng = np.random.RandomState(0)
    batches = [random_batch(cfg, BATCH, rng) for _ in range(8)]

    # Warmup: compile + a few steps (also triggers the periodic scale scan).
    for i in range(5):
        state, loss = step(state, batches[i % len(batches)])
    jax.block_until_ready(loss)

    n_iters = 200
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, loss = step(state, batches[i % len(batches)])
    jax.block_until_ready(loss)
    dt_ms = (time.perf_counter() - t0) / n_iters * 1e3

    print(
        json.dumps(
            {
                "metric": "qat_train_step_ms",
                "value": round(dt_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / dt_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
