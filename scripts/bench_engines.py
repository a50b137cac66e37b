"""One-chip engine-structure comparison: plain vs dp vs hybrid vs rowshard
(round 5, VERDICT r4 #2 "plus a rowshard number").

All on a 1-device mesh (degenerate collectives; full engine structure
executes), Kaggle INT4 QAT, B=128, k=16 scan megasteps, drained
chain-slope. SCALING.md consumes the hybrid/rowshard compute terms.

Run on chip: python scripts/bench_engines.py
"""

from __future__ import annotations

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
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.parallel import (  # noqa: E402
    comm_grad,
    hybrid,
    make_mesh,
    rowshard,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    make_multi_train_step,
    stack_batches,
)

BATCH, K = 128, 16


def _free(st):
    jax.tree_util.tree_map(
        lambda x: x.delete() if hasattr(x, "delete") else None, st
    )


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = kaggle_config(
        QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                    scale_update_period=200)
    )
    tc = TrainConfig(batch_size=BATCH, learning_rate=0.1,
                     onehot_update_max_rows=20000)
    rng = np.random.RandomState(0)
    arg = jax.device_put(
        stack_batches([random_batch(cfg, BATCH, rng) for _ in range(K)])
    )
    mesh1 = make_mesh(1)
    rep = NamedSharding(mesh1, P())
    results = {}

    # plain
    st = TrainState(params=_fast_device_init(cfg), opt_state=None,
                    qstate=dlrm.init_quant_state(cfg))
    multi = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
    best = float("inf")
    for _ in range(2):
        ms, st = sustained_ms_per_it(multi, st, arg, K)
        best = min(best, ms)
    results["plain"] = round(best, 4)
    print(json.dumps({"plain": results["plain"]}), flush=True)
    _free(st); del st

    # dp int8
    dst = comm_grad.dp_state_from(
        _fast_device_init(cfg), dlrm.init_quant_state(cfg)
    )
    dstep = comm_grad.make_dp_train_step(cfg, tc, mesh1, steps_per_dispatch=K)
    best = float("inf")
    for _ in range(2):
        ms, dst = sustained_ms_per_it(dstep, dst, arg, K)
        best = min(best, ms)
    results["dp_int8"] = round(best, 4)
    print(json.dumps({"dp_int8": results["dp_int8"]}), flush=True)
    _free(dst); del dst

    # hybrid (same construction as bench.py's hybrid_ms section)
    hplan = hybrid.plan_table_sharding(cfg.table_sizes, 1)
    hparams = _fast_device_init(cfg)
    hmega = hybrid.pack_tables(hparams["emb"], hplan, mesh1)
    for t in hparams["emb"]:
        if hasattr(t, "delete"):
            t.delete()
    hmlp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep),
        {"bot": hparams["bot"], "top": hparams["top"]},
    )
    hqs = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(cfg)
    )
    hstate = hybrid.HybridState(mega=hmega, mlp=hmlp, qstate=hqs, vw=None)
    hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh1, hplan,
                                          steps_per_dispatch=K)
    best = float("inf")
    for _ in range(2):
        ms, hstate = sustained_ms_per_it(hstep, hstate, arg, K)
        best = min(best, ms)
    results["hybrid"] = round(best, 4)
    print(json.dumps({"hybrid": results["hybrid"]}), flush=True)
    _free(hstate); del hstate

    # rowshard
    rplan = rowshard.plan_row_sharding(cfg.table_sizes, 1)
    rparams = _fast_device_init(cfg)
    rmega = rowshard.pack_rows(rparams["emb"], rplan, mesh1)
    for t in rparams["emb"]:
        if hasattr(t, "delete"):
            t.delete()
    rmlp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep),
        {"bot": rparams["bot"], "top": rparams["top"]},
    )
    rqs = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(cfg)
    )
    rstate = rowshard.RowShardState(mega=rmega, mlp=rmlp, qstate=rqs, vw=None)
    rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh1, rplan,
                                              steps_per_dispatch=K)
    best = float("inf")
    for _ in range(2):
        ms, rstate = sustained_ms_per_it(rstep, rstate, arg, K)
        best = min(best, ms)
    results["rowshard"] = round(best, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
