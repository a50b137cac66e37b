"""Per-stage breakdown of the dp comm-grad engine's overhead vs the plain
single-chip sparse step (VERDICT r3 weak #1 / next #2).

All measurements use the honest drained chain-slope methodology
(bench.sustained_ms_per_it) on a 1-device mesh, where every collective is
degenerate but every quantize/coalesce/pack stage executes. Variants:

  plain       single-chip sparse k=16 megastep (the bench headline)
  dp_int8     full dp engine, INT8 sparse+dense exchange (bench dp metric)
  dp_fp32     grad_quant_bits=32: no quantize/dequantize/pack anywhere —
              isolates the quantization-stage cost
  dp_int4     nibble-packed INT4 sparse exchange (pack/unpack heavier,
              wire bytes halved — wire is free at world=1, so any delta
              vs int8 is pure pack cost)
  dp_ec       int8 + error-feedback residuals (extra MLP-grad state)

Run on chip: python scripts/bench_dp_breakdown.py
Results recorded in PARITY.md §"dp engine overhead".
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from bench import _fast_device_init, sustained_ms_per_it
from deep_quantized_recommendation_model_dqrm_tpu.config import (
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.parallel import comm_grad, make_mesh
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    TrainState,
    make_multi_train_step,
    stack_batches,
)

BATCH, K = 128, 16


def dp_state(cfg):
    return comm_grad.dp_state_from(
        _fast_device_init(cfg), dlrm.init_quant_state(cfg)
    )


def main():
    cfg = kaggle_config(
        QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                    scale_update_period=200)
    )
    base_tc = TrainConfig(batch_size=BATCH, learning_rate=0.1,
                          onehot_update_max_rows=20000)
    rng = np.random.RandomState(0)
    host_batches = [random_batch(cfg, BATCH, rng) for _ in range(K)]
    stacked = jax.device_put(stack_batches(host_batches))
    batches = [jax.device_put(b) for b in host_batches]
    mesh1 = make_mesh(1)

    results = {}

    # plain single-chip sparse megastep
    multi = make_multi_train_step(cfg, base_tc, K, sparse_emb_grad=True)
    st = TrainState(params=_fast_device_init(cfg), opt_state=None,
                    qstate=dlrm.init_quant_state(cfg))
    best = float("inf")
    for _ in range(2):
        ms, st = sustained_ms_per_it(multi, st, batches, K)
        best = min(best, ms)
    results["plain"] = round(best, 4)
    jax.tree_util.tree_map(
        lambda x: x.delete() if hasattr(x, "delete") else None, st
    )

    variants = {
        "dp_int8": base_tc.replace(grad_quant_bits=8),
        "dp_fp32": base_tc.replace(grad_quant_bits=32),
        "dp_int4": base_tc.replace(grad_quant_bits=4),
        "dp_ec": base_tc.replace(grad_quant_bits=8, error_compensation=True),
    }
    for name, tc in variants.items():
        step = comm_grad.make_dp_train_step(cfg, tc, mesh1,
                                            steps_per_dispatch=K)
        dst = dp_state(cfg)
        best = float("inf")
        for _ in range(2):
            ms, dst = sustained_ms_per_it(step, dst, stacked, K)
            best = min(best, ms)
        results[name] = round(best, 4)
        jax.tree_util.tree_map(
            lambda x: x.delete() if hasattr(x, "delete") else None, dst
        )
        print(json.dumps({name: results[name]}), flush=True)

    results["quantize_cost"] = round(results["dp_int8"] - results["dp_fp32"], 4)
    results["engine_structure_cost"] = round(
        results["dp_fp32"] - results["plain"], 4
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
