"""On-chip threshold sweep for the one-hot MXU kernels inside the REAL
sparse k=16 megastep (the bench.py path).

The kernels (ops/pallas/onehot_update.py) replace the latency-bound serial
row gather (~7.4 ns/row) and scatter-add (~34 ns/row) with VMEM-tiled one-hot
matmuls for tables under a row-count threshold. They were measured in
isolation (scripts/bench_onehot_lookup.py / bench_onehot_scatter.py); this
script measures them where it matters — inside the full megastep — to pick
the production default for --onehot-lookup-max-rows/--onehot-update-max-rows.

Methodology: chain-slope + forced readback (see bench.py docstring).

Usage:  python scripts/bench_onehot_megastep.py [B] [K] [lk:up,lk:up,...] [arch]
(third arg overrides the default threshold sweep list; arch = kaggle |
terabyte — terabyte runs bf16 tables with pinned row-major layout, the
production Terabyte path)
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
from bench import _fast_device_init, sustained_ms_per_it  # noqa: E402

from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    TrainConfig,
    kaggle_config,
    terabyte_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    make_multi_train_step,
)


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    arch = sys.argv[4] if len(sys.argv) > 4 else "kaggle"

    q = QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                    scale_update_period=200)
    if arch == "terabyte":
        # the production Terabyte single-chip path: bf16 master tables,
        # pinned row-major layout (see train_step.pin_params_layout)
        base_cfg = dataclasses.replace(terabyte_config(q),
                                       table_dtype="bfloat16")
    else:
        base_cfg = kaggle_config(q)
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(base_cfg, B, rng)) for _ in range(K)]

    # (lookup_max_rows, update_max_rows) sweep. 0 = serial gather/scatter.
    sweeps = [
        (0, 0),
        (0, 2048),
        (0, 20000),
        (2048, 2048),
        (20000, 20000),
        (131072, 131072),
    ]
    if len(sys.argv) > 3:
        sweeps = [tuple(int(v) for v in pair.split(":"))
                  for pair in sys.argv[3].split(",")]
    results = []
    for lk, up in sweeps:
        cfg = dataclasses.replace(base_cfg, onehot_lookup_max_rows=lk)
        tc = TrainConfig(batch_size=B, learning_rate=0.1,
                         onehot_update_max_rows=up)
        # fresh params per sweep: the megastep donates its state buffers
        if arch == "terabyte":
            from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                _rowmajor_format,
                jit_with_pinned_tables,
            )

            # pin each table at creation — pinning afterwards transiently
            # doubles the model in HBM and OOMs (see _fast_device_init)
            params = _fast_device_init(cfg, table_format=_rowmajor_format())
            state = TrainState(params=params, opt_state=None,
                               qstate=dlrm.init_quant_state(cfg))
            body = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True,
                                         _jit=False)
            step = jit_with_pinned_tables(body, state)
        else:
            step = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
            state = TrainState(params=_fast_device_init(cfg), opt_state=None,
                               qstate=dlrm.init_quant_state(cfg))
        best = float("inf")
        for _ in range(2):
            ms, state = sustained_ms_per_it(step, state, batches, K)
            best = min(best, ms)
        # free this sweep's model before the next init (the Terabyte arch
        # cannot hold two copies in HBM)
        for leaf in jax.tree_util.tree_leaves(state):
            if hasattr(leaf, "delete"):
                leaf.delete()
        del state
        n_lk = sum(1 for n in cfg.table_sizes if 0 < n <= lk)
        n_up = sum(1 for n in cfg.table_sizes if 0 < n <= up)
        print(f"lookup<= {lk:>7} ({n_lk:>2} tables)  update<= {up:>7} "
              f"({n_up:>2} tables)  ->  {best:.4f} ms/it", flush=True)
        results.append((lk, up, best))

    base = results[0][2]
    winner = min(results, key=lambda r: r[2])
    print(f"\nbaseline {base:.4f} ms/it; best {winner[2]:.4f} ms/it at "
          f"lookup<={winner[0]} update<={winner[1]} "
          f"({base / winner[2]:.2f}x)")


if __name__ == "__main__":
    main()
