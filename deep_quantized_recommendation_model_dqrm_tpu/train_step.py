"""Single-chip jitted train/eval steps.

The functional core of the reference's training loops (canonical loop
dlrm_s_pytorch.py:1501-1781; QAT loop dlrm_s_pytorch_comm_grad.py:1849-1991):
forward -> BCE -> backward -> LR policy -> optimizer update, with the QAT
scale-update schedule folded in as explicit state. Distributed variants live
in `parallel/`.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.optim import (
    adagrad_init,
    adagrad_update,
    lr_policy,
    rwsadagrad_init,
    rwsadagrad_update,
    sgd_update,
)


# SGD sparse updates pre-coalesce so the scatter can claim unique+sorted
# hints — measured 2.3x at 93k rows / 8k updates on v5e, but a slight LOSS
# at 2.2M rows where the sort/segment work stops paying for itself
# (scripts/bench_stream_update.py, 2026-08-21). Tables above the row cap
# keep the plain duplicate scatter — and so do SMALL batches: the
# coalesce's sort/cumsum/slot chain is op-latency overhead that only
# amortizes at large update counts (measured: +0.75 ms/it at 128 updates
# on the B=128 Kaggle megastep; +0.4 ms/it at 2048 updates on the
# B=2048 Terabyte megastep; 2.3x WIN at 8192 updates). Gate at 4096.
_SORTED_SCATTER_MAX_ROWS = 1_000_000
_SORTED_SCATTER_MIN_UPDATES = 4096


class TrainState(NamedTuple):
    params: Any
    opt_state: Any  # None for plain SGD
    qstate: dlrm.QuantState


def config_for_epoch(config: DLRMConfig, tc: TrainConfig, epoch: int) -> DLRMConfig:
    """QAT epoch schedule (comm_grad.py:1849-1872): FP32 pretrain epochs,
    delayed MLP quantization, mid-training bit-width shift. Returns the
    effective config for `epoch`; callers rebuild the (cached) jitted step
    when it changes — bit widths are compile-time constants on TPU."""
    import dataclasses

    qc = config.quant
    if not qc.enabled:
        return config
    if epoch < tc.pretrain_epochs:
        return dataclasses.replace(config, quant=dataclasses.replace(qc, enabled=False))
    quantize_mlp = qc.quantize_mlp and (
        tc.quantize_mlp_from_epoch < 0 or epoch >= tc.quantize_mlp_from_epoch
    )
    wb = qc.weight_bit
    bb = qc.bias_bit
    if 0 <= tc.shift_bit_width_at_epoch <= epoch:
        wb = tc.shift_bit_width_to
        if bb == qc.weight_bit:
            # the reference's change_bitw shifts weight AND bias width
            # together (comm_grad.py:576-581); keep an explicit bias_bit
            # override (e.g. 32) pinned
            bb = wb
    if quantize_mlp == qc.quantize_mlp and wb == qc.weight_bit and bb == qc.bias_bit:
        return config
    return dataclasses.replace(
        config,
        quant=dataclasses.replace(
            qc, quantize_mlp=quantize_mlp, weight_bit=wb, bias_bit=bb
        ),
    )


def init_train_state(
    config: DLRMConfig, tc: TrainConfig, seed: Optional[int] = None
) -> TrainState:
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    if tc.optimizer == "sgd":
        opt_state = None
    elif tc.optimizer == "adagrad":
        opt_state = adagrad_init(params)
    elif tc.optimizer == "rwsadagrad":
        opt_state = rwsadagrad_init(params)
    else:
        raise ValueError(f"unknown optimizer {tc.optimizer!r}")
    return TrainState(params=params, opt_state=opt_state, qstate=dlrm.init_quant_state(config))


def _build_step_fn(
    config: DLRMConfig, tc: TrainConfig
) -> Callable[[TrainState, dlrm.Batch], Tuple[TrainState, jax.Array]]:
    """The un-jitted train-step body — compose under jit directly or inside
    lax.scan megasteps (see bench.py)."""

    def step_fn(state: TrainState, batch: dlrm.Batch) -> Tuple[TrainState, jax.Array]:
        qstate = state.qstate
        if config.quant.enabled:
            # Periodic scale refresh (paper §3.2) before the forward, like
            # QuantEmbeddingBagTwo's in-forward recompute.
            qstate = dlrm.update_emb_scales(config, state.params, qstate)

        def loss_fn(params):
            logits, new_qs = dlrm.forward(config, params, batch, qstate, train=True)
            return dlrm.training_loss(config, logits, batch.labels), new_qs

        (loss, new_qs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if tc.loss_scale != 1.0:
            # Grad-accumulation sum-of-means semantics (TrainConfig.loss_scale
            # docstring): scale the gradient, keep the reported loss a mean.
            grads = jax.tree_util.tree_map(lambda g: g * tc.loss_scale, grads)

        # 1-based step count matches LRPolicyScheduler._step_count semantics.
        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )
        if tc.optimizer == "sgd":
            params = sgd_update(state.params, grads, lr)
            opt_state = state.opt_state
        elif tc.optimizer == "adagrad":
            params, opt_state = adagrad_update(state.params, grads, state.opt_state, lr)
        else:
            params, opt_state = rwsadagrad_update(state.params, grads, state.opt_state, lr)

        new_qs = new_qs._replace(step=qstate.step + 1)
        return TrainState(params, opt_state, new_qs), loss

    return step_fn


def _build_sparse_step_fn(
    config: DLRMConfig, tc: TrainConfig
) -> Callable[[TrainState, dlrm.Batch], Tuple[TrainState, jax.Array]]:
    """Train-step body with EXPLICIT sparse embedding updates.

    Autodiff through the gather yields dense zero-plus-scatter table
    gradients; XLA does NOT reliably fuse that into an in-place scatter on
    the real chip (honest chain-slope measurement 2026-08-19: the dense
    body costs 14.3 ms/it on the Kaggle model vs 0.42 for this sparse
    variant). This variant cuts autodiff at the pooled lookups and
    applies (ids, rows) scatter updates directly — the same sparse-gradient
    mechanism as nn.EmbeddingBag(sparse=True) + the reference's manual SGD
    (sgd_quantized_gradients_parallel_comm.py:601-685) — so update cost is
    O(touched rows) by construction. SGD and RWSAdagrad (row-wise state on
    touched rows, optim/rwsadagrad.py) are supported.

    QR/MD trick tables and learned pooling weights do NOT force the dense
    body: exactly as in parallel/comm_grad.py, trick tables (small by
    construction, dense tiny grads) are differentiated through a recompute
    (dlrm.splice_trick_pooled) while dense tables keep sparse (ids, rows)
    updates; learned v_W gets analytic per-occurrence scalar grads
    (g_pooled . E[row]) applied as a sparse scatter. The reference runs
    QR/MD only under full autograd (dlrm_s_pytorch.py:239-286) — this split
    keeps them at sparse-step cost instead.
    """
    from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        coalesce_sparse_grad,
        coalesce_sparse_grads_batched,
        rows_grad_from_pooled,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
        dense_grad_auto,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.stream_update import (
        sort_sparse_grads_batched,
        stream_update_auto,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.optim.sgd import EPS

    if tc.optimizer not in ("sgd", "adagrad", "rwsadagrad"):
        raise ValueError("sparse step supports sgd / adagrad / rwsadagrad")
    qc = config.quant
    learned_vw = config.weighted_pooling == "learned"
    trick_ks = frozenset(
        k for k in range(config.num_tables) if config.table_kind(k) != "dense"
    )

    def step_fn(state: TrainState, batch: dlrm.Batch) -> Tuple[TrainState, jax.Array]:
        params, qstate = state.params, state.qstate
        if qc.enabled:
            qstate = dlrm.update_emb_scales(config, params, qstate)

        mlp_params = {k: v for k, v in params.items() if k != "emb"}
        if trick_ks:
            mlp_params["emb_trick"] = {
                str(k): params["emb"][k] for k in sorted(trick_ks)
            }
        raw_pooled = dlrm.lookup_all(
            config,
            {
                **params,
                "emb": jax.tree_util.tree_map(
                    jax.lax.stop_gradient, params["emb"]
                ),
            },
            batch.indices,
            batch.mask,
            full_precision=not qc.enabled,
        )

        def loss_fn(mlp_p, pooled):
            if trick_ks:
                vw = None
                if config.weighted_pooling is not None:
                    vw = (
                        mlp_p["v_W"]
                        if learned_vw
                        else [
                            jax.lax.stop_gradient(v) for v in params["v_W"]
                        ]
                    )
                pooled = dlrm.splice_trick_pooled(
                    config, mlp_p["emb_trick"], vw, batch.indices,
                    batch.mask, pooled, trick_ks,
                )
            fwd_p = {kk: v for kk, v in mlp_p.items() if kk != "emb_trick"}
            logits, new_qs = dlrm.forward(
                config,
                {**fwd_p, "emb": params["emb"]},
                batch,
                qstate,
                train=True,
                raw_pooled=pooled,
            )
            return dlrm.training_loss(config, logits, batch.labels), new_qs

        (loss, new_qs), (mlp_grads, g_pooled) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(mlp_params, raw_pooled)
        if tc.loss_scale != 1.0:
            # Grad-accumulation sum-of-means semantics (TrainConfig.loss_scale
            # docstring); g_pooled feeds every sparse update downstream.
            mlp_grads = jax.tree_util.tree_map(
                lambda g: g * tc.loss_scale, mlp_grads
            )
            g_pooled = g_pooled * tc.loss_scale

        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        new_params = dict(params)
        new_opt = state.opt_state
        if tc.optimizer == "sgd":
            for k, sub in mlp_grads.items():
                if k == "emb_trick":
                    continue  # handled with the tables below
                new_params[k] = jax.tree_util.tree_map(
                    lambda p, g: p - lr * g, params[k], sub
                )
        else:  # adagrad / rwsadagrad dense part (classic Adagrad)
            new_opt = dict(state.opt_state)
            for k, sub in mlp_grads.items():
                if k == "emb_trick":
                    continue  # handled with the tables below
                acc = jax.tree_util.tree_map(
                    lambda s, g: s + g * g, state.opt_state[k], sub
                )
                new_params[k] = jax.tree_util.tree_map(
                    lambda p, g, s: p - lr * g / (jnp.sqrt(s) + EPS),
                    params[k], sub, acc,
                )
                new_opt[k] = acc

        def _ids_vals(k):
            eff_m = batch.mask[k] if batch.mask is not None else None
            if config.weighted_pooling is not None:
                # d pooled / d row = v_W[row] (per_sample_weights,
                # dlrm_s_pytorch.py:417-418). "fixed" weights stay ones in
                # practice, but imported checkpoints may carry other values.
                w_rows = jnp.take(params["v_W"][k], batch.indices[k], axis=0)
                eff_m = w_rows if eff_m is None else eff_m * w_rows
            return rows_grad_from_pooled(g_pooled[k], batch.indices[k], eff_m)

        # Mid-size tables: tile-streaming scatter-add
        # (ops/pallas/stream_update.py). Sort all eligible tables' sparse
        # grads in ONE fused payload sort; SGD streams straight into the
        # table, Adagrad/RWSAdagrad stream a dense gradient and reuse the
        # dense-optimizer math of the one-hot branch (untouched rows see
        # dense == 0, preserving touched-rows-only semantics exactly).
        stream_sorted = {}
        if tc.stream_update_max_rows > 0:
            stream_ks = [
                k
                for k in range(config.num_tables)
                if k not in trick_ks
                and tc.onehot_update_max_rows
                < params["emb"][k].shape[0]
                <= tc.stream_update_max_rows
            ]
            if stream_ks:
                pairs = [_ids_vals(k) for k in stream_ks]
                sids_all, svals_all = sort_sparse_grads_batched(
                    [p[0] for p in pairs], [p[1] for p in pairs]
                )
                stream_sorted = {
                    k: (sids_all[i], svals_all[i])
                    for i, k in enumerate(stream_ks)
                }

        # NOTE on batching the per-table coalesces here: measured a small
        # REGRESSION at B=128 (0.342 -> ~0.348 ms/it) — only ~3 mid
        # tables are eligible under the SGD defaults, and the stack/slice
        # copies cost more than 3 saved sorts. The dp engine batches
        # because ALL 26 tables coalesce there (0.16 ms win); the
        # learned-vw path below batches for the same reason. Per-table
        # stays the right call for THIS path.
        new_emb = []
        new_emb_acc = [] if tc.optimizer in ("adagrad", "rwsadagrad") else None
        for k, table in enumerate(params["emb"]):
            if k in trick_ks:
                # QR/MD: dense tiny grads from the trick recompute; apply
                # the optimizer per leaf exactly as the dense-autodiff body
                # would (optim/sgd.py semantics: rwsadagrad gives q/r/table
                # leaves row-wise accumulators, MD proj stays classic).
                g_trick = mlp_grads["emb_trick"][str(k)]
                if tc.optimizer == "sgd":
                    new_emb.append(
                        jax.tree_util.tree_map(
                            lambda p, g: (p - lr * g).astype(p.dtype),
                            table, g_trick,
                        )
                    )
                elif tc.optimizer == "adagrad":
                    acc = state.opt_state["emb"][k]
                    acc2 = jax.tree_util.tree_map(
                        lambda s, g: s + g * g, acc, g_trick
                    )
                    new_emb.append(
                        jax.tree_util.tree_map(
                            lambda p, g, s: (
                                p - lr * g / (jnp.sqrt(s) + EPS)
                            ).astype(p.dtype),
                            table, g_trick, acc2,
                        )
                    )
                    new_emb_acc.append(acc2)
                else:  # rwsadagrad dict branch (optim/sgd.py:94-106)
                    acc = state.opt_state["emb"][k]
                    upd, st = {}, {}
                    for kk in table:
                        g = g_trick[kk]
                        if kk in ("q", "r", "table"):
                            st[kk] = acc[kk] + jnp.mean(g * g, axis=1)
                            upd[kk] = (
                                table[kk]
                                - lr * g / (jnp.sqrt(st[kk])[:, None] + EPS)
                            ).astype(table[kk].dtype)
                        else:  # MD projection: classic Adagrad
                            st[kk] = acc[kk] + g * g
                            upd[kk] = (
                                table[kk] - lr * g / (jnp.sqrt(st[kk]) + EPS)
                            ).astype(table[kk].dtype)
                    new_emb.append(upd)
                    new_emb_acc.append(st)
                continue
            n_rows = table.shape[0]
            if k in stream_sorted and tc.optimizer == "sgd":
                sids, svals = stream_sorted[k]
                new_emb.append(
                    stream_update_auto(
                        table, sids, -lr * svals, presorted=True
                    )
                )
                continue
            dense = None
            if k in stream_sorted:
                # Adagrad/RWSAdagrad need per-row coalesced sums before the
                # square; stream the sorted grad into a dense array and fall
                # through to the dense-optimizer math below.
                sids, svals = stream_sorted[k]
                dense = stream_update_auto(
                    jnp.zeros((n_rows, svals.shape[-1]), jnp.float32),
                    sids, svals, presorted=True,
                )
            else:
                ids, vals = _ids_vals(k)
                if 0 < n_rows <= tc.onehot_update_max_rows:
                    # Small table: the coalesced dense gradient via the MXU
                    # one-hot kernel replaces the serial scatter (34 ns/row
                    # latency-bound); the optimizer update becomes dense
                    # elementwise math. Untouched rows have dense == 0, so
                    # the touched-rows-only optimizer semantics are
                    # preserved exactly (see ops/pallas/onehot_update.py).
                    dense = dense_grad_auto(ids, vals, n_rows)
            if dense is not None:
                if tc.optimizer == "sgd":
                    new_emb.append(
                        table + (-lr * dense).astype(table.dtype)
                    )
                elif tc.optimizer == "adagrad":
                    acc = state.opt_state["emb"][k]
                    acc2 = acc + dense * dense
                    new_emb.append(
                        table
                        + (-lr * dense / (jnp.sqrt(acc2) + EPS)).astype(
                            table.dtype
                        )
                    )
                    new_emb_acc.append(acc2)
                else:  # rwsadagrad: row-wise accumulator
                    acc = state.opt_state["emb"][k]
                    acc2 = acc + jnp.mean(dense * dense, axis=1)
                    std = jnp.sqrt(acc2)[:, None] + EPS
                    new_emb.append(
                        table + (-lr * dense / std).astype(table.dtype)
                    )
                    new_emb_acc.append(acc2)
                continue
            if tc.optimizer == "sgd":
                if (n_rows <= _SORTED_SCATTER_MAX_ROWS
                        and ids.shape[0] >= _SORTED_SCATTER_MIN_UPDATES):
                    # Pre-coalescing (sort + segment-sum) lets the scatter
                    # claim unique+sorted hints: measured 0.329 vs 0.756 ms
                    # at 93k rows / 8k updates on v5e (scripts/
                    # bench_stream_update.py). Above ~1M rows the win
                    # inverts (1.41 vs 1.28 ms at 2.2M) — the plain
                    # duplicate scatter stays for the multi-M tables.
                    uids, uvals = coalesce_sparse_grad(
                        ids, vals, n_rows, max_unique=ids.shape[0]
                    )
                    new_emb.append(
                        table.at[uids].add(
                            (-lr * uvals).astype(table.dtype), mode="drop",
                            unique_indices=True, indices_are_sorted=True,
                        )
                    )
                else:
                    new_emb.append(
                        table.at[ids].add(
                            (-lr * vals).astype(table.dtype), mode="drop"
                        )
                    )
            elif tc.optimizer == "adagrad":
                # per-element Adagrad on touched rows only (torch sparse
                # Adagrad semantics): coalesce, acc += g^2, w -= lr g/sqrt
                uids, uvals = coalesce_sparse_grad(
                    ids, vals, table.shape[0], max_unique=ids.shape[0]
                )
                acc = state.opt_state["emb"][k]
                # coalesce_sparse_grad guarantees sorted duplicate-free ids
                # (padding = distinct out-of-range, dropped) -> the scatters
                # may claim the hints (2-3x on v5e, bench_dedupe_scatter.py)
                acc2 = acc.at[uids].add(
                    uvals * uvals, mode="drop",
                    unique_indices=True, indices_are_sorted=True,
                )
                denom = jnp.sqrt(acc2.at[uids].get(mode="clip")) + EPS
                new_emb.append(
                    table.at[uids].add(
                        (-lr * uvals / denom).astype(table.dtype), mode="drop",
                        unique_indices=True, indices_are_sorted=True,
                    )
                )
                new_emb_acc.append(acc2)
            else:
                # row-wise sparse Adagrad on touched rows only
                # (optim/rwsadagrad.py:74-118). Duplicate ids must be
                # coalesced first (torch sparse .coalesce() semantics) so
                # acc += mean(summed_row_grad^2) matches the dense update.
                uids, uvals = coalesce_sparse_grad(
                    ids, vals, table.shape[0], max_unique=ids.shape[0]
                )
                acc = state.opt_state["emb"][k]
                row_ms = jnp.mean(uvals * uvals, axis=1)  # [K]
                # sorted duplicate-free ids from coalesce -> hints legal
                acc2 = acc.at[uids].add(
                    row_ms, mode="drop",
                    unique_indices=True, indices_are_sorted=True,
                )
                std = jnp.sqrt(acc2.at[uids].get(mode="clip"))[:, None] + EPS
                new_emb.append(
                    table.at[uids].add(
                        (-lr * uvals / std).astype(table.dtype), mode="drop",
                        unique_indices=True, indices_are_sorted=True,
                    )
                )
                new_emb_acc.append(acc2)
        new_params["emb"] = new_emb
        if tc.optimizer in ("adagrad", "rwsadagrad"):
            new_opt["emb"] = new_emb_acc

        if learned_vw:
            # Learned pooling weights for DENSE tables: the autodiff cut
            # severed v_W (mlp_grads["v_W"][k] is zero there — the dense
            # part above was a no-op on them), so apply the analytic
            # per-occurrence scalar grads d pooled[b]/d v_W[idx[b,p]] =
            # base_mask * E[idx] . g_pooled[b] as a coalesced sparse
            # scatter — the same math as parallel/comm_grad.py's learned-vw
            # exchange, minus the all_gather. Trick tables' v_W grads came
            # through the recompute and were applied densely above.
            pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
            new_vw = list(new_params["v_W"])
            vw_acc = (
                list(new_opt["v_W"])
                if tc.optimizer in ("adagrad", "rwsadagrad")
                else None
            )
            # all-QR/MD models have no dense table here: every v_W grad
            # came through the trick recompute, applied densely above
            vw_ks = [
                k for k in range(config.num_tables) if k not in trick_ks
            ]
            # batched per-occurrence scalar grads + ONE coalesce across
            # all tables (same latency argument as the table grads above)
            if vw_ks:
                tbls = []
                for k in vw_ks:
                    tbl = params["emb"][k]
                    if pact:
                        tbl = q.fake_quant_pact(tbl, qc.embedding_bit)
                    tbls.append(jnp.take(tbl, batch.indices[k], axis=0))
                rows_e = jnp.stack(tbls)  # [T,B,P,D]
                gp_st = jnp.stack([g_pooled[k] for k in vw_ks]).astype(
                    jnp.float32
                )
                contrib = jnp.einsum(
                    "tbd,tbpd->tbp", gp_st, rows_e.astype(jnp.float32)
                )
                if batch.mask is not None:
                    contrib = contrib * batch.mask[jnp.asarray(vw_ks)]
                ids_st = batch.indices[jnp.asarray(vw_ks)].reshape(
                    len(vw_ks), -1
                )
                nrv = jnp.asarray(
                    [new_vw[k].shape[0] for k in vw_ks], ids_st.dtype
                )
                vu_ids, vu_vals = coalesce_sparse_grads_batched(
                    ids_st, contrib.reshape(len(vw_ks), -1, 1), nrv,
                    ids_st.shape[1],
                )
            for i, k in enumerate(vw_ks):
                uids = vu_ids[i]
                g1 = vu_vals[i][:, 0]
                if tc.optimizer == "sgd":
                    new_vw[k] = new_vw[k].at[uids].add(
                        -lr * g1, mode="drop",
                        unique_indices=True, indices_are_sorted=True,
                    )
                else:
                    # v_W is a flat [n] vector: element-wise Adagrad ==
                    # row-wise Adagrad at D=1 (both optimizers agree).
                    acc2 = vw_acc[k].at[uids].add(
                        g1 * g1, mode="drop",
                        unique_indices=True, indices_are_sorted=True,
                    )
                    denom = jnp.sqrt(acc2.at[uids].get(mode="clip")) + EPS
                    new_vw[k] = new_vw[k].at[uids].add(
                        -lr * g1 / denom, mode="drop",
                        unique_indices=True, indices_are_sorted=True,
                    )
                    vw_acc[k] = acc2
            new_params["v_W"] = new_vw
            if vw_acc is not None:
                new_opt["v_W"] = vw_acc

        new_qs = new_qs._replace(step=qstate.step + 1)
        return TrainState(new_params, new_opt, new_qs), loss

    return step_fn


def make_train_step(
    config: DLRMConfig, tc: TrainConfig, sparse_emb_grad: bool = False
) -> Callable[[TrainState, dlrm.Batch], Tuple[TrainState, jax.Array]]:
    """Build the jitted train step. Donates the state for in-place updates
    (critical for GB-scale embedding tables in HBM). `sparse_emb_grad`
    selects the explicit sparse-update body (see `_build_sparse_step_fn`)."""
    body = _build_sparse_step_fn(config, tc) if sparse_emb_grad else _build_step_fn(config, tc)
    return jax.jit(body, donate_argnums=(0,))


def make_multi_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    k: int,
    sparse_emb_grad: bool = False,
    use_scan: bool = True,
    _jit: bool = True,
):
    """K-step training megastep: one dispatch runs `k` sequential train
    steps via `lax.scan` (numerically identical to `k` calls of the single
    step — losses come out stacked, the last one is returned).

    Takes (TrainState, [Batch; k] list or one Batch with a leading [k]
    axis) and returns (state, last loss). The stacked form is strongly
    preferred on tunneled hosts: a list dispatch uploads ~4k separate host
    buffers (each a tunnel round trip); stacked is 3-4 uploads total.

    Why a megastep at all: per-dispatch overhead on a tunneled host is
    ~0.3 ms while the sparse step computes in ~0.4 ms (honest chain-slope
    measurement, bench.py) — k=16 amortizes the dispatch to noise.

    Why scan: measured EQUAL to the unrolled form on chip (0.423 vs
    0.417 ms/it, 2026-08-19 — the round-1 "scan breaks scatter fusion"
    finding was an enqueue-timing artifact), compiles in seconds instead
    of ~40 s, and its program footprint stays O(1) in k (the unrolled
    Terabyte-arch k=16 megastep OOMs HBM at 11.8 GB of program memory;
    the scan form fits). `use_scan=False` restores the unrolled body.
    """
    body = (
        _build_sparse_step_fn(config, tc)
        if sparse_emb_grad
        else _build_step_fn(config, tc)
    )

    def _stack_in_graph(batches):
        return dlrm.Batch(
            dense=jnp.stack([b.dense for b in batches]),
            indices=jnp.stack([b.indices for b in batches]),
            labels=jnp.stack([b.labels for b in batches]),
            mask=None
            if batches[0].mask is None
            else jnp.stack([b.mask for b in batches]),
        )

    def multi(state: TrainState, batches):
        loss = None
        if use_scan:
            stacked = (
                batches
                if isinstance(batches, dlrm.Batch)
                else _stack_in_graph(list(batches))
            )
            state, losses = jax.lax.scan(
                lambda st, b: body(st, b), state, stacked
            )
            return state, losses[-1]
        if isinstance(batches, dlrm.Batch):  # stacked [k, ...] form
            for i in range(k):
                b = jax.tree_util.tree_map(lambda x: x[i], batches)
                state, loss = body(state, b)
        else:
            for b in batches:
                state, loss = body(state, b)
        return state, loss

    if not _jit:
        # raw body for callers that jit with extra constraints
        # (jit_with_pinned_tables)
        return multi
    return jax.jit(multi, donate_argnums=(0,))


def _rowmajor_format():
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    return Format(
        Layout(major_to_minor=(0, 1)), SingleDeviceSharding(dev)
    )


def pin_params_layout(params: dlrm.Params) -> dlrm.Params:
    """Relayout the embedding tables to ROW-MAJOR, one table at a time
    (staged so the compact original is freed before the next relayout —
    doing the whole model at once transiently doubles HBM).

    Why: XLA stores [n, d] tables column-major at rest (compact: the long
    axis rides the 128 lanes) but the scatter-update wants row-major, so
    every megastep dispatch pays two full-model layout-conversion copies —
    and the conversion temporaries OOM HBM for the 6.3 GB Terabyte model
    (measured: the bf16 d=64 k=16 megastep allocates 11.7 GB of program
    memory and dies). Pinning row-major kills the copies at the cost of
    lane padding AT REST: rows pad to 128 lanes, so memory grows by
    128/(d*4/elem_bytes) — 2x for bf16 d=64 (fits: 11.7 GB), 8x for fp32
    d=16 (do NOT pin the Kaggle model). Measured Terabyte k=16: OOM ->
    9.29 ms/it at batch 2048.
    """
    fmt = _rowmajor_format()
    emb = list(params["emb"])
    for i, t in enumerate(emb):
        if isinstance(t, dict):
            continue  # QR/MD trick tables are small; leave default
        emb[i] = jax.device_put(t, fmt)
        emb[i].block_until_ready()
        # TAKE OWNERSHIP: free the compact original NOW. The caller's
        # params still reference it, so without the delete both full
        # copies stay alive until the caller rebinds — at Terabyte scale
        # 6.3 GB compact + 12.6 GB padded = 18.9 GB > HBM (the round-2
        # OOM lesson: pin one table at a time, free as you go). Callers
        # must rebind their params from the returned dict immediately.
        t.delete()
    return {**params, "emb": emb}


def jit_with_pinned_tables(fn, state_template: TrainState):
    """jit `fn(state, batches) -> (state, loss)` with the emb tables pinned
    to row-major layouts on both the inputs and outputs (so the layout is
    stable across dispatches — no boundary conversions). The state passed
    at call time must already be `pin_params_layout`-ed."""
    fmt = _rowmajor_format()
    spec = jax.tree_util.tree_map(lambda x: None, state_template)
    emb_spec = [
        None if isinstance(t, dict) else fmt
        for t in state_template.params["emb"]
    ]
    spec = spec._replace(params={**spec.params, "emb": emb_spec})
    return jax.jit(
        fn, donate_argnums=(0,), in_shardings=(spec, None),
        out_shardings=(spec, None),
    )


def stack_batches(batches) -> dlrm.Batch:
    """Stack k host Batches into one leading-[k]-axis Batch (host-side
    numpy — one device upload per field instead of one per batch)."""
    import numpy as np

    return dlrm.Batch(
        dense=np.stack([np.asarray(b.dense) for b in batches]),
        indices=np.stack([np.asarray(b.indices) for b in batches]),
        labels=np.stack([np.asarray(b.labels) for b in batches]),
        mask=None
        if batches[0].mask is None
        else np.stack([np.asarray(b.mask) for b in batches]),
    )


def concat_batches(batches) -> dlrm.Batch:
    """Concatenate k host Batches along the batch axis into one [k*B] batch.

    Gradient accumulation (`--mlperf-grad-accum-iter`,
    dlrm_s_pytorch.py:1595-1601): the gradient of the mean loss over the
    concatenation equals the mean of the per-batch gradients; the reference
    sums the per-batch mean grads instead (backward without zero_grad), so
    callers set TrainConfig.loss_scale=k to recover the reference's
    sum-of-means trajectory exactly (A/B'd in
    tests/test_reference_parity.py::test_grad_accum_matches_reference)."""
    import numpy as np

    return dlrm.Batch(
        dense=np.concatenate([np.asarray(b.dense) for b in batches], axis=0),
        indices=np.concatenate([np.asarray(b.indices) for b in batches], axis=1),
        labels=np.concatenate([np.asarray(b.labels) for b in batches], axis=0),
        mask=None
        if batches[0].mask is None
        else np.concatenate([np.asarray(b.mask) for b in batches], axis=1),
    )


def make_eval_step(
    config: DLRMConfig,
) -> Callable[[TrainState, dlrm.Batch], jax.Array]:
    """Jitted inference step returning click probabilities (the reference's
    `inference()` per-batch body, dlrm_s_pytorch.py:762-860)."""

    def eval_fn(state: TrainState, batch: dlrm.Batch) -> jax.Array:
        return dlrm.predict(config, state.params, batch, state.qstate)

    return jax.jit(eval_fn)


def make_grad_probe(config: DLRMConfig, tc: TrainConfig):
    """Jitted per-batch embedding-gradient extractor for
    `--documenting-table-grads` (the gradient half of the reference's
    documenting driver, dlrm_s_pytorch_single_gpu_documentingp.py:969-987
    `weight.grad` table dumps; weights-only there — grads were a
    commented-out block — both surfaces are live here).

    Returns fn(params, qstate, batch) -> (out, loss) where `out` maps
      "table_<k>_ids"  -> [B*P] row ids touched by this batch
      "table_<k>_rows" -> [B*P, D] per-occurrence row gradients
                          (duplicate ids NOT coalesced — scatter-add them
                          to reproduce the dense gradient exactly)
    for dense tables, and "table_<k>_<leaf>" -> dense gradient arrays for
    QR/MD trick tables. Gradients are w.r.t. the PRE-update parameters on
    the given batch — exactly what the training step consumes.
    """
    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        rows_grad_from_pooled,
    )

    qc = config.quant
    trick_ks = frozenset(
        k for k in range(config.num_tables) if config.table_kind(k) != "dense"
    )

    def probe(params: dlrm.Params, qstate: dlrm.QuantState, batch: dlrm.Batch):
        if qc.enabled:
            qstate = dlrm.update_emb_scales(config, params, qstate)
        mlp_params = {k: v for k, v in params.items() if k != "emb"}
        if trick_ks:
            mlp_params["emb_trick"] = {
                str(k): params["emb"][k] for k in sorted(trick_ks)
            }
        raw_pooled = dlrm.lookup_all(
            config,
            {
                **params,
                "emb": jax.tree_util.tree_map(
                    jax.lax.stop_gradient, params["emb"]
                ),
            },
            batch.indices,
            batch.mask,
            full_precision=not qc.enabled,
        )

        def loss_fn(mlp_p, pooled):
            if trick_ks:
                vw = None
                if config.weighted_pooling is not None:
                    vw = [jax.lax.stop_gradient(v) for v in params["v_W"]]
                pooled = dlrm.splice_trick_pooled(
                    config, mlp_p["emb_trick"], vw, batch.indices,
                    batch.mask, pooled, trick_ks,
                )
            fwd_p = {kk: v for kk, v in mlp_p.items() if kk != "emb_trick"}
            logits, _ = dlrm.forward(
                config,
                {**fwd_p, "emb": params["emb"]},
                batch,
                qstate,
                train=True,
                raw_pooled=pooled,
            )
            return dlrm.training_loss(config, logits, batch.labels)

        loss, (mlp_grads, g_pooled) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(mlp_params, raw_pooled)

        out = {}
        for k in range(config.num_tables):
            if k in trick_ks:
                for leaf_name, g in mlp_grads["emb_trick"][str(k)].items():
                    out[f"table_{k}_{leaf_name}"] = g
                continue
            eff_m = batch.mask[k] if batch.mask is not None else None
            if config.weighted_pooling is not None:
                w_rows = jnp.take(params["v_W"][k], batch.indices[k], axis=0)
                eff_m = w_rows if eff_m is None else eff_m * w_rows
            ids, vals = rows_grad_from_pooled(
                g_pooled[k], batch.indices[k], eff_m
            )
            out[f"table_{k}_ids"] = ids
            out[f"table_{k}_rows"] = vals
        return out, loss

    return jax.jit(probe)
