"""Overfitting-regime INT4-vs-FP32 A/B on the attached chip.

The paper's headline accuracy claim is INT4 QAT >= FP32 on Criteo Kaggle
(README.md:42-45, Table 3a) — an effect the paper attributes to
quantization acting as a REGULARIZER on a finite dataset trained to the
overfitting point. The round-1 accuracy proxy (tools/accuracy_proxy.py)
streams infinite synthetic data, a regime with no overfitting where the
effect cannot appear (PARITY.md). This tool closes that loop: a FINITE
learnable-synthetic train set is revisited for many epochs so the FP32
model overfits, and the per-epoch held-out AUC curves of FP32 vs INT4 QAT
are compared directly — the in-framework analogue of the reference's
5-epoch single-GPU overfitting studies (dlrm_s_pytorch_one_gpu.py,
reference README "overfitting" discussion).

Defaults: 26 Kaggle-shaped tables capped at 50k rows, d=16, standard
Kaggle MLPs, 512 train batches of 128 (65,536 samples), 30 epochs,
noise=1.0 (noisier labels => more memorization incentive).

Usage: python tools/overfit_ab.py [--epochs 30] [--modes fp32,emb4,full4]
Prints one JSON line per mode: per-epoch test-AUC curve, peak and final
train/test AUC.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    kaggle_config,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    LearnableSyntheticLoader,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    make_eval_step,
    make_multi_train_step,
    stack_batches,
)
from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import roc_auc  # noqa: E402

K = 16  # steps per dispatch


def mode_config(mode: str, cap: int, period: int):
    base = kaggle_config()
    sizes = tuple(min(n, cap) for n in base.table_sizes)
    if mode == "fp32":
        q = QuantConfig()
    elif mode == "emb4":
        q = QuantConfig(enabled=True, embedding_bit=4, quantize_mlp=False,
                        scale_update_period=period)
    elif mode == "full4":
        q = QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        scale_update_period=period)
    else:
        raise ValueError(mode)
    return dataclasses.replace(base, table_sizes=sizes, quant=q)


def _auc(ev, state, batches) -> float:
    scores = [np.asarray(ev(state, b)) for b in batches]
    ys = [np.asarray(b.labels) for b in batches]
    return float(roc_auc(np.concatenate(scores), np.concatenate(ys)))


def run_mode(mode: str, args) -> dict:
    cfg = mode_config(mode, args.cap, args.scale_period)
    tc = TrainConfig(batch_size=args.batch, learning_rate=args.learning_rate,
                     seed=args.seed)
    import bench as _bench

    state = TrainState(
        params=_bench._fast_device_init(cfg),
        opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    # Finite train set, device-resident as K-step megastep stacks.
    n_stacks = args.train_batches // K
    train = list(
        LearnableSyntheticLoader(cfg, args.batch, n_stacks * K, seed=args.seed,
                                 noise=args.noise)
    )
    stacks = [
        jax.device_put(stack_batches(train[i * K : (i + 1) * K]))
        for i in range(n_stacks)
    ]
    test = [
        jax.device_put(b)
        for b in LearnableSyntheticLoader(cfg, 16384, 4, seed=args.seed + 99_999,
                                          noise=args.noise)
    ]
    # fixed train subset for the train-AUC (memorization) readout
    train_sub = [jax.device_put(b) for b in train[:32]]
    multi = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
    ev = make_eval_step(cfg)

    t0 = time.perf_counter()
    curve_test, curve_train = [], []
    for _ in range(args.epochs):
        loss = None
        for s in stacks:
            state, loss = multi(state, s)
        jax.block_until_ready(loss)
        curve_test.append(round(_auc(ev, state, test), 4))
        curve_train.append(round(_auc(ev, state, train_sub), 4))
    return {
        "mode": mode,
        "epochs": args.epochs,
        "train_samples": n_stacks * K * args.batch,
        "test_auc_curve": curve_test,
        "train_auc_final": curve_train[-1],
        "test_auc_peak": max(curve_test),
        "test_auc_final": curve_test[-1],
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--train-batches", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--learning-rate", type=float, default=0.1)
    p.add_argument("--cap", type=int, default=50_000)
    p.add_argument("--noise", type=float, default=1.0)
    p.add_argument("--scale-period", type=int, default=200)
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--modes", type=str, default="fp32,emb4,full4")
    args = p.parse_args()
    for mode in args.modes.split(","):
        print(json.dumps(run_mode(mode, args)), flush=True)


if __name__ == "__main__":
    main()
