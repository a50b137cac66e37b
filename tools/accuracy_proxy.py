"""Accuracy-gate proxy at Kaggle scale on the attached chip.

Real Criteo is unreachable (no network egress), so the gate runs on the
learnable-synthetic stand-in (data/synthetic.LearnableSyntheticLoader) with
the full Kaggle architecture (26 tables, d=16, 13-512-256-64-16 /
512-256-1). Trains FP32, emb-only INT4, and full INT4 QAT for --steps
steps and prints one JSON line per mode with the held-out AUC.

NOTE the regime caveat (PARITY.md): an infinite synthetic stream has no
overfitting, so INT4's regularization benefit (the paper's INT4 >= FP32 on
Criteo) cannot appear here — expect emb-only INT4 to track FP32 closely and
full INT4 to trail slightly. Numerics parity with the reference is proven
separately by tests/test_reference_parity.py.

Usage: python tools/accuracy_proxy.py [--steps 10000] [--modes fp32,emb4,full4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
    LearnableSyntheticLoader,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_multi_train_step,
    stack_batches,
)
from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import roc_auc

K = 16  # steps per dispatch


def mode_config(mode: str):
    if mode == "fp32":
        return kaggle_config()
    if mode.startswith("emb") and mode[3:] in ("4", "8", "16"):
        # emb-only QAT at 4/8/16 bits — the paper Table 2 sweep axis
        # (README.md:42-45, bash_scripts/Kaggle/emb_bit_{4,8,16}.txt)
        return kaggle_config(
            QuantConfig(enabled=True, embedding_bit=int(mode[3:]),
                        quantize_mlp=False, scale_update_period=200)
        )
    if mode == "full4":
        return kaggle_config(
            QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        scale_update_period=200)
        )
    if mode in ("pact4", "lsq4"):
        # Competing QAT schemes at INT4 (paper Table 3a: "PACT can't
        # converge; LSQ 78.972%/0.8051" vs HAWQ 79.040%/0.8064)
        return kaggle_config(
            QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                        quant_scheme=mode[:-1], scale_update_period=200)
        )
    if mode == "qr":
        # quotient-remainder structural compression on every table > 200
        # rows (collisions=4 -> ~4x row reduction on the big tables)
        import dataclasses

        return dataclasses.replace(
            kaggle_config(), qr_flag=True, qr_threshold=200, qr_collisions=4
        )
    raise ValueError(mode)


def _device_init(cfg):
    """Device-side init for any table kind (same distributions as
    models.dlrm.init_params; see bench._fast_device_init for why)."""
    import bench as _bench

    def _with_lsq_steps(p):
        # LSQ learned steps (models.dlrm.init_params rule: 2*mean|w|/sqrt(Qp)),
        # computed on-device from the already-device-resident tables.
        if not (cfg.quant.enabled and cfg.quant.quant_scheme == "lsq"):
            return p
        import jax.numpy as jnp

        qp_e = 2 ** (cfg.quant.embedding_bit - 1) - 1
        p["lsq_emb"] = [
            2.0 * jnp.mean(jnp.abs(t)) / jnp.sqrt(float(qp_e))
            if not isinstance(t, dict) else jnp.ones((), jnp.float32)
            for t in p["emb"]
        ]
        if cfg.quant.quantize_mlp:
            qp_w = 2 ** (cfg.quant.weight_bit - 1) - 1
            p["lsq_mlp"] = {
                part: [
                    {
                        "w": 2.0 * jnp.mean(jnp.abs(l["w"]), axis=1)
                        / jnp.sqrt(float(qp_w)),
                        "b": 2.0 * jnp.mean(jnp.abs(l["b"]))
                        / jnp.sqrt(float(qp_w)),
                    }
                    for l in p[part]
                ]
                for part in ("bot", "top")
            }
        return p

    if all(cfg.table_kind(k) == "dense" for k in range(cfg.num_tables)):
        return _with_lsq_steps(_bench._fast_device_init(cfg))
    import dataclasses

    import jax.numpy as jnp

    # MLPs (and a 1-row emb placeholder per table, so the big dense tables
    # are NOT transiently materialized — the whole point of device init)
    base = _bench._fast_device_init(
        dataclasses.replace(
            cfg,
            qr_flag=False,
            md_flag=False,
            table_sizes=tuple(
                n if cfg.table_kind(k) == "dense" else 1
                for k, n in enumerate(cfg.table_sizes)
            ),
        )
    )
    key = jax.random.PRNGKey(1)
    ks = iter(jax.random.split(key, 2 * cfg.num_tables))
    md_dims = cfg.md_dims()
    emb = []
    for k, n in enumerate(cfg.table_sizes):
        kind = cfg.table_kind(k)
        bound = (1.0 / n) ** 0.5
        if kind == "qr":
            c = cfg.qr_collisions
            num_q = (n + c - 1) // c
            d_q = d_r = cfg.embedding_dim
            if cfg.qr_operation == "concat":
                d_q = cfg.embedding_dim // 2
                d_r = cfg.embedding_dim - d_q
            emb.append({
                "q": jax.random.uniform(next(ks), (num_q, d_q), jnp.float32,
                                        -bound, bound),
                "r": jax.random.uniform(next(ks), (c, d_r), jnp.float32,
                                        -bound, bound),
            })
        elif kind == "md":
            d_k = md_dims[k]
            entry = {
                "table": jax.random.uniform(next(ks), (n, d_k), jnp.float32,
                                            -bound, bound)
            }
            if d_k < cfg.embedding_dim:
                lim = (6.0 / (d_k + cfg.embedding_dim)) ** 0.5
                entry["proj"] = jax.random.uniform(
                    next(ks), (cfg.embedding_dim, d_k), jnp.float32, -lim, lim
                )
            emb.append(entry)
        else:
            emb.append(base["emb"][k])
    return _with_lsq_steps({**base, "emb": emb})


def run_mode(mode: str, steps: int, batch: int, lr: float, seed: int,
             serving_eval: bool = False) -> dict:
    cfg = mode_config(mode)
    tc = TrainConfig(batch_size=batch, learning_rate=lr, seed=seed)
    # device-side init: host-side numpy generation + tunnel transfer of the
    # 2.16 GB Kaggle tables takes minutes; the distributions are identical
    # (see bench._fast_device_init)
    state = TrainState(
        params=_device_init(cfg),
        opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    sparse = all(cfg.table_kind(k) == "dense" for k in range(cfg.num_tables))
    multi = make_multi_train_step(cfg, tc, K, sparse_emb_grad=sparse)
    train = LearnableSyntheticLoader(cfg, batch, steps, seed=seed)
    t0 = time.perf_counter()
    buf = []
    it = 0
    loss = float("nan")
    for b in train:
        buf.append(b)
        if len(buf) == K:
            state, loss = multi(state, stack_batches(buf))
            buf = []
            it += K
    # trailing steps % K batches: run them through the single step so the
    # reported step count is exact
    if buf:
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            make_train_step,
        )

        single = make_train_step(cfg, tc, sparse_emb_grad=sparse)
        for b in buf:
            state, loss = single(state, b)
            it += 1
    ev = make_eval_step(cfg)
    scores, ys = [], []
    eval_batches = list(
        LearnableSyntheticLoader(cfg, 16384, 8, seed=seed + 99_999)
    )
    for b in eval_batches:
        scores.append(np.asarray(ev(state, b)))
        ys.append(np.asarray(b.labels))
    auc = roc_auc(np.concatenate(scores), np.concatenate(ys))
    out = {
        "mode": mode,
        "steps": it,
        "auc": round(float(auc), 4),
        "final_loss": round(float(loss), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    if serving_eval:
        # PTQ-export the trained model and score the SERVING path per MLP
        # impl: validates the int8 dynamic-activation MXU GEMM's quant
        # error at the AUC level (VERDICT round-2 #6 gate for defaulting
        # mlp_impl="int8") and the one-hot small-table lookup.
        from deep_quantized_recommendation_model_dqrm_tpu.serving import (
            make_serving_fn,
            ptq_export,
        )

        sm = ptq_export(cfg, state.params, emb_bits=4, mlp_bits=8)
        y = np.concatenate(ys)
        for impl, oh in (("xla", 0), ("int8", 0), ("int8", 15000)):
            fn = make_serving_fn(sm, mlp_impl=impl,
                                 onehot_lookup_max_rows=oh)
            sc = np.concatenate([np.asarray(fn(b)) for b in eval_batches])
            out[f"serving_auc_{impl}_oh{oh}"] = round(
                float(roc_auc(sc, y)), 4
            )
    return out


def run_mode_dp(mode: str, steps: int, batch: int, lr: float,
                seed: int) -> dict:
    """dp comm-grad engine modes on a 1-device mesh (collectives
    degenerate; the full INT8 quantize/coalesce/exchange path executes):

      dp8   INT8 compressed+sparsified gradient exchange (the headline dp
            production config)
      rr    dp8 + the ranking-range mixed-bit policy (50% skip / 30% INT8
            / 20% hi per step, parallel/ranking_range.py) — records what
            the policy costs in AUC (reference analogue: paper Table 4's
            accuracy columns; sgd_quantized_gradients_parallel_comm.py:
            158-255). VERDICT r3 #6.
    """
    from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
        comm_grad,
        make_mesh,
    )

    cfg = mode_config("full4")
    tc = TrainConfig(
        batch_size=batch, learning_rate=lr, seed=seed,
        grad_quant_bits=8, ranking_range=(mode == "rr"),
        onehot_update_max_rows=20000,
    )
    mesh = make_mesh(1)
    state = comm_grad.dp_state_from(
        _device_init(cfg), dlrm.init_quant_state(cfg)
    )
    step = comm_grad.make_dp_train_step(cfg, tc, mesh, steps_per_dispatch=K)
    train = LearnableSyntheticLoader(cfg, batch, steps - steps % K, seed=seed)
    t0 = time.perf_counter()
    buf, it, loss = [], 0, float("nan")
    for b in train:
        buf.append(b)
        if len(buf) == K:
            state, loss = step(state, stack_batches(buf))
            buf = []
            it += K
    ev = make_eval_step(cfg)  # reads .params/.qstate — DPState quacks
    scores, ys = [], []
    for b in LearnableSyntheticLoader(cfg, 16384, 8, seed=seed + 99_999):
        scores.append(np.asarray(ev(state, b)))
        ys.append(np.asarray(b.labels))
    auc = roc_auc(np.concatenate(scores), np.concatenate(ys))
    return {
        "mode": mode,
        "steps": it,
        "auc": round(float(auc), 4),
        "final_loss": round(float(loss), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def run_overfit(
    mode: str, epochs: int, n_batches: int, batch: int, lr: float, seed: int
) -> dict:
    """Finite-data multi-epoch regime: a FIXED dataset of `n_batches`
    batches looped `epochs` times, held-out test AUC per epoch.

    This is the regime where the paper's INT4 >= FP32 claim lives
    (4 epochs over finite Criteo, README.md:42-45): quantization noise
    acts as a regularizer once the model can overfit. The infinite-stream
    proxy (run_mode) cannot show it — there, quantization is pure capacity
    loss (CLAUDE.md round-1 note).
    """
    cfg = mode_config(mode)
    tc = TrainConfig(batch_size=batch, learning_rate=lr, seed=seed)
    state = TrainState(
        params=_device_init(cfg),
        opt_state=None,
        qstate=dlrm.init_quant_state(cfg),
    )
    sparse = all(cfg.table_kind(k) == "dense" for k in range(cfg.num_tables))
    multi = make_multi_train_step(cfg, tc, K, sparse_emb_grad=sparse)
    n_batches -= n_batches % K
    data = list(LearnableSyntheticLoader(cfg, batch, n_batches, seed=seed))
    stacks = [stack_batches(data[i : i + K]) for i in range(0, n_batches, K)]
    test = list(LearnableSyntheticLoader(cfg, 16384, 8, seed=seed + 99_999))
    ev = make_eval_step(cfg)
    t0 = time.perf_counter()
    curve = []
    loss = float("nan")
    for _ in range(epochs):
        for s in stacks:
            state, loss = multi(state, s)
        scores = [np.asarray(ev(state, b)) for b in test]
        ys = [np.asarray(b.labels) for b in test]
        curve.append(
            round(float(roc_auc(np.concatenate(scores), np.concatenate(ys))), 4)
        )
    return {
        "mode": mode,
        "epochs": epochs,
        "dataset_rows": n_batches * batch,
        "test_auc_curve": curve,
        "best_auc": max(curve),
        "final_auc": curve[-1],
        "final_train_loss": round(float(loss), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--learning-rate", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--modes", type=str, default="fp32,emb4,full4")
    p.add_argument("--epochs", type=int, default=0,
                   help="> 0: finite-data multi-epoch overfit regime "
                        "(--dataset-batches batches looped per epoch)")
    p.add_argument("--dataset-batches", type=int, default=256)
    p.add_argument("--serving-eval", action="store_true",
                   help="after training, PTQ-export and report serving-path "
                        "AUC per MLP impl (xla vs int8 MXU) and one-hot "
                        "lookup threshold")
    args = p.parse_args()
    for mode in args.modes.split(","):
        if mode in ("dp8", "rr"):
            r = run_mode_dp(mode, args.steps, args.batch,
                            args.learning_rate, args.seed)
        elif args.epochs > 0:
            r = run_overfit(mode, args.epochs, args.dataset_batches,
                            args.batch, args.learning_rate, args.seed)
        else:
            r = run_mode(mode, args.steps, args.batch, args.learning_rate,
                         args.seed, serving_eval=args.serving_eval)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
