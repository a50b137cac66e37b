"""Row-sharded embedding parallelism: the mega-table split by GLOBAL ROWS.

TPU-native scaling extension beyond the reference (SURVEY §7.6 names it;
the reference only shards whole tables — create_emb keeps local_emb_indices,
dlrm_s_pytorch.py:243-245). Table-granular sharding (parallel/hybrid.py) has
two ceilings the reference inherits:

  1. a single table must fit one device (Criteo-Terabyte's 10M-row d=64
     table is 2.5 GB fp32 — fine on 16 GB, fatal for 10x bigger tables);
  2. n_devices must be <= n_tables for any balance at all.

Here the concatenated global row space [R_total, D] is split into n_dev
equal chunks regardless of table boundaries, so a giant table simply spans
devices and any device count works. The step stays ONE jitted shard_map:

- forward: every device computes PARTIAL pooled sums [T, B, D] from the
  rows it owns (out-of-range lookups masked to zero), then one
  `psum_scatter` over the mesh axis both completes the sums and leaves each
  device exactly its batch shard [T, B/n, D] — the row-sharded analogue of
  the hybrid step's all-to-all. MLPs are data-parallel as in hybrid.
- backward: autodiff of psum_scatter is an all_gather, so each device
  receives the full pooled-output gradient and scatter-adds only into the
  rows it owns — no gradient collective for the tables.
- QAT per-table scales: per-table min/max is a cross-device reduction here
  (a table may span chunks): local masked min/max per table under lax.cond
  (the expensive block scan), then unconditional pmin/pmax [T] (collectives
  must not sit inside cond branches — see hybrid.py).

Comm tradeoff vs table-sharding: psum_scatter moves [T, B, D]*(n-1)/n per
device where the a2a moves ~[T/n, B, D]*(n-1)/n — about n_dev x more pooled
bytes. Row-sharding buys capacity/balance, not bandwidth; prefer the hybrid
step when tables fit.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.optim import lr_policy


class RowShardPlan(NamedTuple):
    """Static layout of the row-sharded mega-table."""

    n_dev: int
    chunk: int  # rows per device (last row of the LAST chunk is zero pad)
    table_base: np.ndarray  # [T] global base row of each table


def plan_row_sharding(table_sizes: Tuple[int, ...], n_dev: int) -> RowShardPlan:
    base = np.concatenate([[0], np.cumsum(np.asarray(table_sizes, np.int64))])
    total = int(base[-1]) + 1  # +1 global zero pad row (masked lookups hit it)
    chunk = -(-total // n_dev)  # ceil
    return RowShardPlan(n_dev=n_dev, chunk=chunk, table_base=base[:-1])


def pack_rows(
    tables: List[jax.Array],
    plan: RowShardPlan,
    mesh: Optional[Mesh] = None,
    axis: str = "mp",
) -> jax.Array:
    """Concatenate tables into the padded global mega-table
    [n_dev * chunk, D]; with a mesh, place row-sharded."""
    D = tables[0].shape[-1]
    mega = jnp.concatenate(
        tables
        + [jnp.zeros((plan.n_dev * plan.chunk - sum(t.shape[0] for t in tables), D),
                     tables[0].dtype)],
        axis=0,
    )
    if mesh is not None:
        mega = jax.device_put(mega, NamedSharding(mesh, P(axis)))
    return mega


def unpack_rows(
    mega: jax.Array, plan: RowShardPlan, table_sizes: Tuple[int, ...]
) -> List[jax.Array]:
    out = []
    for k, rows in enumerate(table_sizes):
        start = int(plan.table_base[k])
        out.append(jax.lax.dynamic_slice(mega, (start, 0), (rows, mega.shape[1])))
    return out


class RowShardState(NamedTuple):
    mega: jax.Array  # [n_dev*chunk, D] row-sharded global mega-table
    mlp: Any  # replicated MLP params
    qstate: dlrm.QuantState


def init_rowshard_state(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: RowShardPlan,
    axis: str = "mp",
    seed: Optional[int] = None,
) -> RowShardState:
    if any(config.table_kind(k) != "dense" for k in range(config.num_tables)):
        raise NotImplementedError(
            "QR/MD embeddings cannot be row-sharded (their whole point is "
            "being small); use parallelism=hybrid or dp, which carry them "
            "replicated"
        )
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    mega = pack_rows(params["emb"], plan, mesh, axis)
    rep = NamedSharding(mesh, P())
    mlp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep),
        {k: v for k, v in params.items() if k != "emb"},
    )
    qstate = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(config)
    )
    return RowShardState(mega=mega, mlp=mlp, qstate=qstate)


def _partial_pooled(
    block: jax.Array,  # [chunk, D] this device's rows
    gids: jax.Array,  # [T, B, P] GLOBAL row ids
    mask: Optional[jax.Array],
    me: jax.Array,
    chunk: int,
) -> jax.Array:  # [T, B, D] partial sums from owned rows only
    local = gids - me * chunk
    owned = (local >= 0) & (local < chunk)
    rows = jnp.take(block, jnp.clip(local, 0, chunk - 1), axis=0)  # [T,B,P,D]
    w = owned.astype(rows.dtype)
    if mask is not None:
        w = w * mask.astype(rows.dtype)
    return jnp.sum(rows * w[..., None], axis=2)


def _local_table_ranges(
    block: jax.Array,  # [chunk, D]
    me: jax.Array,
    chunk: int,
    table_base: jax.Array,  # [T]
    table_sizes: Tuple[int, ...],
):
    """Per-table (min, max) over the rows of each table that live in this
    chunk (+inf/-inf when none do) — one [chunk, D] pass for all tables."""
    row_min = jnp.min(block, axis=1)  # [chunk]
    row_max = jnp.max(block, axis=1)
    gid = me * chunk + jnp.arange(chunk)
    mins, maxs = [], []
    for t in range(len(table_sizes)):
        lo = table_base[t]
        hi = lo + table_sizes[t]
        in_tbl = (gid >= lo) & (gid < hi)
        mins.append(jnp.min(jnp.where(in_tbl, row_min, jnp.inf)))
        maxs.append(jnp.max(jnp.where(in_tbl, row_max, -jnp.inf)))
    return jnp.stack(mins), jnp.stack(maxs)


def make_rowshard_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: RowShardPlan,
    axis: str = "mp",
    has_mask: bool = False,
    steps_per_dispatch: int = 1,
):
    """Row-sharded hybrid train step (see module docstring).

    Batch layout matches make_hybrid_train_step: dense/labels batch-sharded
    on `axis`, indices/mask replicated.
    """
    if config.weighted_pooling == "learned":
        raise NotImplementedError(
            "weighted_pooling='learned' is not supported by the row-sharded step"
        )
    if any(config.table_kind(k) != "dense" for k in range(config.num_tables)):
        raise NotImplementedError(
            "QR/MD embeddings cannot be row-sharded (their whole point is "
            "being small); use parallelism=hybrid or dp, which carry them "
            "replicated"
        )
    from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q

    qc = config.quant
    n_dev = plan.n_dev
    chunk = plan.chunk
    table_base = jnp.asarray(plan.table_base)

    def device_step(state: RowShardState, batch: dlrm.Batch):
        me = jax.lax.axis_index(axis)
        block = state.mega  # [chunk, D] local shard inside shard_map
        qstate = state.qstate
        gids = batch.indices + table_base[:, None, None]  # [T, B, P] global

        if qc.enabled:
            # Periodic per-table scale refresh: local masked min/max under
            # cond, cross-device pmin/pmax UNconditionally (collectives must
            # not live inside cond branches — hybrid.py gotcha).
            period = max(qc.scale_update_period, 1)
            do_update = (qstate.step % period) == 0
            T = config.num_tables
            l_min, l_max = jax.lax.cond(
                do_update,
                lambda: _local_table_ranges(
                    block, me, chunk, table_base, config.table_sizes,
                ),
                lambda: (jnp.full((T,), jnp.inf), jnp.full((T,), -jnp.inf)),
            )
            g_min = jax.lax.pmin(l_min, axis)
            g_max = jax.lax.pmax(l_max, axis)
            new_scales = jnp.where(
                do_update,
                q.symmetric_quantization_params(qc.embedding_bit, g_min, g_max),
                qstate.emb_scales,
            )
            qstate = qstate._replace(emb_scales=new_scales)

        partial = _partial_pooled(
            jax.lax.stop_gradient(block), gids, batch.mask, me, chunk
        )  # [T, B, D]

        def loss_fn(mlp_p, p_partial):
            # Complete the partial sums AND shard the batch in one
            # collective: psum_scatter over the batch dim -> [T, B/n, D].
            raw_pooled = jax.lax.psum_scatter(
                p_partial, axis, scatter_dimension=1, tiled=True
            )
            local_batch = dlrm.Batch(
                dense=batch.dense,
                indices=batch.indices[:, :1, :],  # unused (raw_pooled given)
                labels=batch.labels,
                mask=None,
            )
            logits, new_qs = dlrm.forward(
                config,
                {**mlp_p, "emb": []},
                local_batch,
                qstate,
                train=True,
                raw_pooled=raw_pooled,
            )
            return dlrm.training_loss(config, logits, batch.labels), new_qs

        (loss, new_qs), (mlp_grads, g_partial) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.mlp, partial)
        # g_partial = all_gather of the per-shard pooled grads = the FULL
        # [T, B, D] pooled-output gradient of the SUM of device losses,
        # identical on every device; each device applies only its owned rows.

        mean_loss = jax.lax.pmean(loss, axis)
        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        if tc.grad_quant_bits < 32:
            from deep_quantized_recommendation_model_dqrm_tpu.parallel.comm_grad import (
                compressed_psum_dense,
            )

            mlp_grads = jax.tree_util.tree_map(
                lambda g: compressed_psum_dense(
                    g, tc.grad_quant_bits, axis, per_channel=(g.ndim == 2)
                ),
                mlp_grads,
            )
        else:
            mlp_grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, axis), mlp_grads
            )
        new_mlp = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, state.mlp, mlp_grads
        )

        # ---- Embedding update: scatter-add into OWNED rows only ----
        local = gids - me * chunk
        owned = (local >= 0) & (local < chunk)
        rows_idx = jnp.where(owned, local, chunk)  # chunk = dropped
        T, B, Pp = batch.indices.shape
        vals = jnp.broadcast_to(
            g_partial[:, :, None, :], (T, B, Pp, g_partial.shape[-1])
        )
        if batch.mask is not None:
            vals = vals * batch.mask[..., None].astype(vals.dtype)
        new_block = block.at[rows_idx.reshape(-1)].add(
            -(lr / n_dev) * vals.reshape(-1, vals.shape[-1]).astype(block.dtype),
            mode="drop",
        )

        new_qs = new_qs._replace(step=qstate.step + 1)
        return RowShardState(new_block, new_mlp, new_qs), mean_loss

    batch_specs = dlrm.Batch(
        dense=P(axis),
        indices=P(),
        labels=P(axis),
        mask=P() if has_mask else None,
    )
    state_specs = RowShardState(mega=P(axis), mlp=P(), qstate=P())

    if steps_per_dispatch > 1:

        def device_multi(state: RowShardState, batches):
            loss = None
            for b in batches:
                state, loss = device_step(state, b)
            return state, loss

        step = shard_map(
            device_multi,
            mesh=mesh,
            in_specs=(state_specs, [batch_specs] * steps_per_dispatch),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        return jax.jit(step, donate_argnums=(0,))

    step = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_rowshard_eval_step(
    config: DLRMConfig,
    mesh: Mesh,
    plan: RowShardPlan,
    axis: str = "mp",
    has_mask: bool = False,
):
    """Sharded inference over row-sharded state; returns probs for the FULL
    batch (tables never unpacked — see make_hybrid_eval_step)."""
    table_base = jnp.asarray(plan.table_base)
    chunk = plan.chunk

    def device_eval(state: RowShardState, batch: dlrm.Batch) -> jax.Array:
        me = jax.lax.axis_index(axis)
        gids = batch.indices + table_base[:, None, None]
        partial = _partial_pooled(state.mega, gids, batch.mask, me, chunk)
        raw_pooled = jax.lax.psum_scatter(
            partial, axis, scatter_dimension=1, tiled=True
        )
        local_batch = dlrm.Batch(
            dense=batch.dense,
            indices=batch.indices[:, :1, :],
            labels=batch.labels,
            mask=None,
        )
        logits, _ = dlrm.forward(
            config, {**state.mlp, "emb": []}, local_batch, state.qstate,
            train=False, raw_pooled=raw_pooled,
        )
        p = jax.nn.sigmoid(logits)
        if 0.0 < config.loss_threshold < 1.0:
            p = jnp.clip(p, config.loss_threshold, 1.0 - config.loss_threshold)
        return jax.lax.all_gather(p, axis, tiled=True)

    batch_specs = dlrm.Batch(
        dense=P(axis),
        indices=P(),
        labels=P(axis),
        mask=P() if has_mask else None,
    )
    state_specs = RowShardState(mega=P(axis), mlp=P(), qstate=P())
    fn = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)
