"""HBM budget report for a model/training configuration.

Prints per-component device-memory footprints (tables, MLPs, optimizer
state, activations estimate) and the compiled step's actual buffer sizes via
XLA's memory analysis — the planning tool the reference lacks (its OOMs
were discovered by crashing; paper Table 3 model sizes were hand-computed).

Usage: python tools/memory_report.py [--data-set kaggle|terabyte]
       [--table-dtype float32|bfloat16] [--batch 128] [--optimizer sgd]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-set", default="kaggle", choices=["kaggle", "terabyte"])
    ap.add_argument("--table-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--optimizer", default="sgd",
                    choices=["sgd", "adagrad", "rwsadagrad"])
    ap.add_argument("--quant", action="store_true", default=True)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from deep_quantized_recommendation_model_dqrm_tpu.config import (
        QuantConfig,
        TrainConfig,
        kaggle_config,
        terabyte_config,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
        random_batch,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
        _build_sparse_step_fn,
        init_train_state,
    )

    make = kaggle_config if args.data_set == "kaggle" else terabyte_config
    cfg = make(QuantConfig(enabled=args.quant))
    cfg = dataclasses.replace(cfg, table_dtype=args.table_dtype)
    tc = TrainConfig(batch_size=args.batch, optimizer=args.optimizer)

    tb = 2 if args.table_dtype == "bfloat16" else 4
    emb_bytes = sum(cfg.table_sizes) * cfg.embedding_dim * tb
    mlp_params = sum(
        a * b + b for ln in (cfg.mlp_bot, cfg.mlp_top) for a, b in zip(ln[:-1], ln[1:])
    )
    print(f"config: {args.data_set}, tables {args.table_dtype}, "
          f"batch {args.batch}, {args.optimizer}")
    print(f"embedding tables: {sum(cfg.table_sizes)/1e6:.1f}M rows x "
          f"{cfg.embedding_dim} = {emb_bytes/1e9:.3f} GB")
    print(f"mlp params:       {mlp_params/1e6:.2f}M = {mlp_params*4/1e6:.1f} MB")
    if args.optimizer == "adagrad":
        opt = emb_bytes / tb * 4 + mlp_params * 4
    elif args.optimizer == "rwsadagrad":
        opt = sum(cfg.table_sizes) * 4 + mlp_params * 4
    else:
        opt = 0
    print(f"optimizer state:  {opt/1e9:.3f} GB")

    # compiled-step truth from XLA (abstract eval — no allocation needed)
    import numpy as np

    state_shape = jax.eval_shape(lambda: init_train_state(cfg, tc))
    batch = random_batch(cfg, args.batch, np.random.RandomState(0))
    step = _build_sparse_step_fn(cfg, tc)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state_shape, batch)
    ma = lowered.compile().memory_analysis()
    if ma is not None:
        print(f"compiled step: args {ma.argument_size_in_bytes/1e9:.3f} GB, "
              f"outputs {ma.output_size_in_bytes/1e9:.3f} GB, "
              f"temp {ma.temp_size_in_bytes/1e6:.1f} MB, "
              f"peak(est) {(ma.argument_size_in_bytes + ma.temp_size_in_bytes)/1e9:.3f} GB")
    else:
        print("compiled memory analysis unavailable on this backend")


if __name__ == "__main__":
    main()
