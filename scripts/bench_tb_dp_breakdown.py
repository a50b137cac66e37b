"""Terabyte dp-engine overhead breakdown (round 5, VERDICT r4 #4).

The Kaggle breakdown (scripts/bench_dp_breakdown.py) proved quantize
machinery ~0.01 ms/it and structure ~0.09; the Terabyte gap (+26%,
11.69 vs 9.24 ms/it in round 4) had no recorded split. Same methodology
at the Terabyte arch: B=2048, d=64, bf16 pinned row-major tables, k=8
scan megastep, 1-device mesh (collectives degenerate, every stage
executes).

Variants:
  plain     pinned single-chip sparse k=8 megastep (the bench-headline
            structure at this K)
  dp_fp32   grad_quant_bits=32 — no quantize/pack anywhere: the
            engine-STRUCTURE cost (batched coalesce + exchange plumbing)
  dp_int8   the production INT8 exchange: dp_int8 - dp_fp32 = quantize cost
  dp_int4   nibble packing on top

HBM discipline: ONE model state lives at a time (pinned Terabyte model is
~12.6 GB); every state is deleted before the next init (round-2 lesson).

Run on chip: python scripts/bench_tb_dp_breakdown.py
Results recorded in PARITY.md §"dp engine overhead".
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from bench import _fast_device_init, sustained_ms_per_it  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    TrainConfig,
    terabyte_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.parallel import (  # noqa: E402
    comm_grad,
    make_mesh,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    _rowmajor_format,
    jit_with_pinned_tables,
    make_multi_train_step,
    stack_batches,
)

B, K = 2048, 8


def _free(st):
    jax.tree_util.tree_map(
        lambda x: x.delete() if hasattr(x, "delete") else None, st
    )


def main():
    cfg = dataclasses.replace(
        terabyte_config(
            QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        scale_update_period=1000)
        ),
        table_dtype="bfloat16",
    )
    base_tc = TrainConfig(batch_size=B, learning_rate=0.1,
                          onehot_update_max_rows=20000)
    rng = np.random.RandomState(0)
    arg = jax.device_put(
        stack_batches([random_batch(cfg, B, rng) for _ in range(K)])
    )
    mesh1 = make_mesh(1)
    results = {}

    # plain pinned sparse megastep at the SAME k as the dp variants
    st = TrainState(
        params=_fast_device_init(cfg, table_format=_rowmajor_format()),
        opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    multi = jit_with_pinned_tables(
        make_multi_train_step(cfg, base_tc, K, sparse_emb_grad=True,
                              _jit=False),
        st,
    )
    # the plain megastep takes a LIST of batches or stacked; stacked works
    best = float("inf")
    for _ in range(2):
        ms, st = sustained_ms_per_it(multi, st, arg, K, n1=8, n2=24)
        best = min(best, ms)
    results["plain"] = round(best, 4)
    print(json.dumps({"plain": results["plain"]}), flush=True)
    _free(st)
    del st

    for name, tc in [
        ("dp_fp32", base_tc.replace(grad_quant_bits=32)),
        ("dp_int8", base_tc.replace(grad_quant_bits=8)),
        ("dp_int4", base_tc.replace(grad_quant_bits=4)),
    ]:
        params = _fast_device_init(cfg, table_format=_rowmajor_format())
        dst = comm_grad.dp_state_from(params, dlrm.init_quant_state(cfg))
        step = comm_grad.make_dp_train_step(
            cfg, tc, mesh1, steps_per_dispatch=K, pin_state_template=dst
        )
        best = float("inf")
        for _ in range(2):
            ms, dst = sustained_ms_per_it(step, dst, arg, K, n1=8, n2=24)
            best = min(best, ms)
        results[name] = round(best, 4)
        print(json.dumps({name: results[name]}), flush=True)
        _free(dst)
        del dst

    results["quantize_cost"] = round(results["dp_int8"] - results["dp_fp32"], 4)
    results["engine_structure_cost"] = round(
        results["dp_fp32"] - results["plain"], 4
    )
    results["dp_overhead_pct"] = round(
        100.0 * (results["dp_int8"] / results["plain"] - 1.0), 1
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
