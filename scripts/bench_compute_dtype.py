"""Measure the bf16 compute-dtype path vs fp32 on the attached TPU chip.

`DLRMConfig.compute_dtype="bfloat16"` (a TPU-first extension with no
reference analogue) casts the MLP/interaction matmul operands to bf16 with
fp32 accumulation, doubling the MXU rate. At the flagship Kaggle batch 128
the train step is dispatch/latency-bound so it cannot show; this script
measures the compute-bound regimes where it matters:

  1. QAT train step at large batch (Terabyte-style batches, e.g. 8192)
  2. FP32 (non-QAT) train step at the same batch
  3. forward-only (serving-style) at batch 16384

Usage: python scripts/bench_compute_dtype.py [--batch 8192] [--arch kaggle]

Findings (TPU v5e-class chip via axon, 2026-08-18, interleaved best-of-3
trials): JAX's DEFAULT matmul precision on TPU already truncates fp32
operands to bf16 on the MXU (measured 187-250 TFLOP/s for "fp32" matmuls —
far above any fp32 pipe), so the explicit bf16 path is mostly redundant for
raw MXU rate on this backend. It still measured consistently (but modestly)
faster on the Kaggle FP-train step at B=8192 — 0.0288/0.0346/0.0306 vs
0.0305/0.0427/0.0382 ms/it (6-19%, every interleaved trial) — from halving
activation bytes through the backward; QAT-step and forward-only deltas were
inside the tunnel's run-to-run noise (~40%). The knob matters most when
`jax_default_matmul_precision=highest` (strict fp32) is set, and it pins the
numerics contract explicitly rather than relying on a backend default.

TIMING CAVEAT (2026-08-19): the loops below time with
`jax.block_until_ready`, which on the axon tunneled backend returns at
ENQUEUE, not completion — absolute numbers this script printed before
2026-08-19 are host enqueue rates, not device compute. Before trusting a
re-run, port the timing to the chain-slope + forced-scalar-readback
pattern (see bench.py / .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    QuantConfig,
    TrainConfig,
    kaggle_config,
    terabyte_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    TrainState,
    make_multi_train_step,
)


def _fast_device_init(cfg):
    """On-device init, same distributions as dlrm.init_params (see bench.py)."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(
        key, len(cfg.table_sizes) + 2 * (len(cfg.mlp_bot) + len(cfg.mlp_top))
    )
    ki = iter(range(len(ks)))

    def mlp(ln):
        layers = []
        for n, m in zip(ln[:-1], ln[1:]):
            layers.append(
                {
                    "w": jax.random.normal(ks[next(ki)], (m, n)) * (2.0 / (m + n)) ** 0.5,
                    "b": jax.random.normal(ks[next(ki)], (m,)) * (1.0 / m) ** 0.5,
                }
            )
        return layers

    emb = [
        jax.random.uniform(
            ks[next(ki)], (n, cfg.embedding_dim), jnp.float32,
            -(1.0 / n) ** 0.5, (1.0 / n) ** 0.5,
        )
        for n in cfg.table_sizes
    ]
    return {"bot": mlp(cfg.mlp_bot), "top": mlp(cfg.mlp_top), "emb": emb}


def _measure_train(cfg, batch_size: int, k: int = 8, n_disp: int = 10) -> float:
    tc = TrainConfig(batch_size=batch_size, learning_rate=0.1)
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(cfg, batch_size, rng)) for _ in range(k)]
    multi = make_multi_train_step(cfg, tc, k)
    state = TrainState(
        params=_fast_device_init(cfg), opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    state, loss = multi(state, batches)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_disp):
            state, loss = multi(state, batches)
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / (n_disp * k) * 1e3)
    return best


def _measure_forward(cfg, batch_size: int, n: int = 50) -> float:
    rng = np.random.RandomState(0)
    batch = jax.device_put(random_batch(cfg, batch_size, rng))
    params = _fast_device_init(cfg)
    qstate = dlrm.update_emb_scales(cfg, params, dlrm.init_quant_state(cfg))

    @jax.jit
    def fwd(params, qstate, batch):
        logits, _ = dlrm.forward(cfg, params, batch, qstate, train=False)
        return logits

    out = fwd(params, qstate, batch)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, qstate, batch)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--fwd-batch", type=int, default=16384)
    ap.add_argument("--arch", choices=("kaggle", "terabyte"), default="kaggle")
    args = ap.parse_args()

    base = kaggle_config if args.arch == "kaggle" else terabyte_config
    qat = QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                      scale_update_period=200)
    print(f"devices: {jax.devices()}  arch={args.arch}")
    for label, cdtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        cfg_q = dataclasses.replace(base(qat), compute_dtype=cdtype)
        cfg_fp = dataclasses.replace(base(QuantConfig()), compute_dtype=cdtype)
        tq = _measure_train(cfg_q, args.batch)
        tf = _measure_train(cfg_fp, args.batch)
        fw = _measure_forward(cfg_q, args.fwd_batch)
        print(
            f"{label}: QAT-train B={args.batch}: {tq:.3f} ms/it | "
            f"FP-train: {tf:.3f} ms/it | QAT-fwd B={args.fwd_batch}: {fw:.3f} ms"
        )


if __name__ == "__main__":
    main()
