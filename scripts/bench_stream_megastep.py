"""On-chip threshold sweep for the tile-streaming scatter-add inside the
REAL sparse megastep (the bench.py path).

The kernel (ops/pallas/stream_update.py) replaces the ~34 ns/row serial
scatter with full-table streaming + per-tile one-hot matmuls for tables in
(onehot_update_max_rows, stream_update_max_rows]. Measured in isolation by
scripts/bench_stream_update.py; this script measures the combination where
it matters — inside the full megastep — to pick the production auto rule
for --stream-update-max-rows (train.py _STREAM_AUTO_*).

Methodology: chain-slope + forced readback (see bench.py docstring).

Usage: python scripts/bench_stream_megastep.py [B] [K] [oh:st,oh:st,...]
(third arg overrides the (onehot_update_max_rows, stream_update_max_rows)
sweep list)
"""

from __future__ import annotations

import sys

import jax
import numpy as np

sys.path.insert(0, ".")
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


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    q = QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                    scale_update_period=200)
    cfg = kaggle_config(q)
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(cfg, B, rng)) for _ in range(K)]

    # (onehot_update_max_rows, stream_update_max_rows) sweep.
    sweeps = [
        (20000, 0),        # round-2 production default
        (20000, 300000),   # 3 mid tables (93k/142k/286k) stream
        (0, 300000),       # every table <= 286k streams (no one-hot)
        (2048, 300000),    # tiny tables one-hot, the rest stream
        (0, 3000000),      # + the 2.2M table
    ]
    if len(sys.argv) > 3:
        sweeps = [tuple(int(v) for v in pair.split(":"))
                  for pair in sys.argv[3].split(",")]
    results = []
    for oh, stm in sweeps:
        tc = TrainConfig(batch_size=B, learning_rate=0.1,
                         onehot_update_max_rows=oh,
                         stream_update_max_rows=stm)
        step = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
        state = TrainState(params=_fast_device_init(cfg), opt_state=None,
                           qstate=dlrm.init_quant_state(cfg))
        best = float("inf")
        for _ in range(2):
            ms, state = sustained_ms_per_it(step, state, batches, K)
            best = min(best, ms)
        for leaf in jax.tree_util.tree_leaves(state):
            if hasattr(leaf, "delete"):
                leaf.delete()
        del state
        n_oh = sum(1 for n in cfg.table_sizes if 0 < n <= oh)
        n_st = sum(1 for n in cfg.table_sizes if oh < n <= stm)
        print(f"onehot<= {oh:>7} ({n_oh:>2} tables)  stream<= {stm:>8} "
              f"({n_st:>2} tables)  ->  {best:.4f} ms/it "
              f"({B / best * 1000 / 1e6:.3f}M samples/s)", flush=True)
        results.append((oh, stm, best))

    base = results[0][2]
    winner = min(results, key=lambda r: r[2])
    print(f"\nbaseline {base:.4f} ms/it; best {winner[2]:.4f} ms/it at "
          f"onehot<={winner[0]} stream<={winner[1]} "
          f"({base / winner[2]:.2f}x)")


if __name__ == "__main__":
    main()
