"""Terabyte hybrid-engine step time on one chip (round 5, VERDICT r4 #2).

The hybrid mega-table at Terabyte scale is one [~98M, 64] bf16 array.
Unpinned, XLA stores it column-major at rest and may pay full-model
relayout copies around the scatter (the round-2 table-layout discovery);
this script measures BOTH the unpinned step and a row-major-pinned mega
(jit output-layout pinning via Format), k=8 scan megastep, B=2048,
drained chain-slope on a 1-device mesh.

Run on chip: python scripts/bench_tb_hybrid.py
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
    hybrid,
    make_mesh,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    _rowmajor_format,
    stack_batches,
)

B, K = 2048, 8


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = dataclasses.replace(
        terabyte_config(
            QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        scale_update_period=1000)
        ),
        table_dtype="bfloat16",
    )
    tc = TrainConfig(batch_size=B, learning_rate=0.1,
                     onehot_update_max_rows=20000)
    mesh1 = make_mesh(1)
    rep = NamedSharding(mesh1, P())
    plan = hybrid.plan_table_sharding(cfg.table_sizes, 1)

    # build the mega-table DIRECTLY pinned row-major, one table at a time
    # (pack_tables would transiently hold the full concat + originals)
    import jax.numpy as jnp

    # MLPs only (1-row table placeholders) — holding all 26 pinned tables
    # (12.6 GB) AND the pinned mega (12.6 GB) would OOM the 16 GB chip
    params = _fast_device_init(
        dataclasses.replace(cfg, table_sizes=(1,) * cfg.num_tables)
    )
    fmt = _rowmajor_format()
    # allocate the mega DIRECTLY in the pinned layout — jnp.zeros +
    # device_put would transiently hold compact (6.3 GB) + pinned (12.6 GB)
    mega = jax.jit(
        lambda: jnp.zeros(
            (plan.n_dev * plan.block_rows, cfg.embedding_dim), jnp.bfloat16
        ),
        out_shardings=fmt,
    )()
    mega.block_until_ready()

    # donated + layout-pinned insert: updates the 12.6 GB mega IN PLACE
    # (an undonated dynamic_update_slice double-buffers 2x12.6 GB -> OOM);
    # tables are generated ONE at a time directly in bf16 (~1.3 GB peak)
    _insert = jax.jit(
        lambda m, t, s: jax.lax.dynamic_update_slice(m, t, (s, 0)),
        donate_argnums=(0,),
        in_shardings=(fmt, None, None),
        out_shardings=fmt,
    )

    key = jax.random.PRNGKey(0)
    CHUNK = 2_000_000  # bound the PRNG's uint32 bits transient (~0.5 GB)
    for k, n in enumerate(cfg.table_sizes):
        bound = (1.0 / n) ** 0.5
        base = int(plan.table_rank[k]) * plan.block_rows + int(plan.table_base[k])
        for off in range(0, n, CHUNK):
            rows = min(CHUNK, n - off)
            key, sub = jax.random.split(key)
            t = jax.random.uniform(
                sub, (rows, cfg.embedding_dim), jnp.bfloat16, -bound, bound
            )
            mega = _insert(mega, t, base + off)
            mega.block_until_ready()
            t.delete()
    hmlp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep),
        {"bot": params["bot"], "top": params["top"]},
    )
    hqs = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(cfg)
    )
    hstate = hybrid.HybridState(mega=mega, mlp=hmlp, qstate=hqs, vw=None)

    rng = np.random.RandomState(0)
    arg = jax.device_put(
        stack_batches([random_batch(cfg, B, rng) for _ in range(K)])
    )
    hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh1, plan,
                                          steps_per_dispatch=K,
                                          pin_mega_layout=True)
    best = float("inf")
    for _ in range(2):
        ms, hstate = sustained_ms_per_it(hstep, hstate, arg, K, n1=8, n2=24)
        best = min(best, ms)
    print(json.dumps({"terabyte_hybrid_ms": round(best, 4),
                      "batch": B, "k": K, "pinned": True}), flush=True)


if __name__ == "__main__":
    main()
