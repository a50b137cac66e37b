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
    # [T] bool: True = dense table (rows live in the mega-table). QR/MD
    # compositional tables are False — they are carried REPLICATED next to
    # the MLPs (exactly like parallel/hybrid.py plan rank -1) and trained
    # data-parallel; their table_base is 0 and never dereferenced.
    dense_mask: np.ndarray = None  # type: ignore[assignment]


def plan_row_sharding(
    table_sizes: Tuple[int, ...],
    n_dev: int,
    kinds: Optional[Tuple[str, ...]] = None,
) -> RowShardPlan:
    """Lay out the global row space over the DENSE tables only.

    `kinds` (config.table_kind per table): non-"dense" QR/MD tables get no
    rows here — small by construction, they replicate next to the MLPs
    (the same placement hybrid.plan_table_sharding gives them via rank -1;
    reference create_emb dispatch, dlrm_s_pytorch.py:239-286).
    """
    T = len(table_sizes)
    dense = np.asarray(
        [kinds is None or kinds[k] == "dense" for k in range(T)], bool
    )
    base = np.zeros(T, np.int64)
    off = 0
    for k in range(T):
        if dense[k]:
            base[k] = off
            off += int(table_sizes[k])
    total = off + 1  # +1 global zero pad row (masked lookups hit it)
    chunk = -(-total // n_dev)  # ceil
    return RowShardPlan(
        n_dev=n_dev, chunk=chunk, table_base=base, dense_mask=dense
    )


def pack_rows(
    tables: List[jax.Array],
    plan: RowShardPlan,
    mesh: Optional[Mesh] = None,
    axis: str = "mp",
) -> jax.Array:
    """Concatenate tables into the padded global mega-table
    [n_dev * chunk, D]; with a mesh, place row-sharded. QR/MD dict entries
    are skipped — the row-sharded step carries them replicated."""
    arrays = [t for t in tables if not isinstance(t, dict)]
    if arrays:
        D, dt = arrays[0].shape[-1], arrays[0].dtype
    else:
        # every table is QR/MD: 1-wide placeholder keeps the shard_map
        # structure (and psum_scatter shapes) uniform
        D, dt = 1, jnp.float32
    pad = plan.n_dev * plan.chunk - sum(t.shape[0] for t in arrays)
    mega = jnp.concatenate(
        arrays + [jnp.zeros((pad, D), dt)], axis=0
    )
    if mesh is not None:
        mega = jax.device_put(mega, NamedSharding(mesh, P(axis)))
    return mega


def unpack_rows(
    mega: jax.Array, plan: RowShardPlan, table_sizes: Tuple[int, ...]
) -> List[Optional[jax.Array]]:
    """Inverse of pack_rows. Trick-table slots (plan.dense_mask False, not
    in the mega-table) come back as None — callers splice the replicated
    dict entries in (mirrors hybrid.unpack_tables)."""
    out = []
    for k, rows in enumerate(table_sizes):
        if plan.dense_mask is not None and not bool(plan.dense_mask[k]):
            out.append(None)
            continue
        start = int(plan.table_base[k])
        out.append(jax.lax.dynamic_slice(mega, (start, 0), (rows, mega.shape[1])))
    return out


def pack_rows_vw(
    v_W: List[jax.Array],
    plan: RowShardPlan,
    mesh: Optional[Mesh] = None,
    axis: str = "mp",
) -> jax.Array:
    """Concatenate per-table pooling weights into the global row layout
    [n_dev*chunk] (pad rows weight 0), row-sharded like the mega-table.
    Trick tables' v_W (plan.dense_mask False) are skipped — they replicate
    next to the MLPs as `vw_trick` (see init_rowshard_state)."""
    packed = pack_rows(
        [
            v[:, None]
            if plan.dense_mask is None or bool(plan.dense_mask[k])
            else {}
            for k, v in enumerate(v_W)
        ],
        plan,
    )[:, 0]
    if mesh is not None:
        packed = jax.device_put(packed, NamedSharding(mesh, P(axis)))
    return packed


def unpack_rows_vw(
    vw: jax.Array, plan: RowShardPlan, table_sizes: Tuple[int, ...]
) -> List[Optional[jax.Array]]:
    return [
        c[:, 0] if c is not None else None
        for c in unpack_rows(vw[:, None], plan, table_sizes)
    ]


class RowShardState(NamedTuple):
    mega: jax.Array  # [n_dev*chunk, D] row-sharded global mega-table
    mlp: Any  # replicated MLP params
    qstate: dlrm.QuantState
    # Pooling weights v_W in the global row layout [n_dev*chunk], sharded
    # like `mega`; None unless config.weighted_pooling is set (see
    # parallel/hybrid.py HybridState.vw for semantics).
    vw: Any = None


def init_rowshard_state(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: RowShardPlan,
    axis: str = "mp",
    seed: Optional[int] = None,
) -> RowShardState:
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    mega = pack_rows(params["emb"], plan, mesh, axis)
    rep = NamedSharding(mesh, P())
    non_emb = {k: v for k, v in params.items() if k != "emb"}
    # QR/MD compositional tables are small by construction: carry them
    # REPLICATED alongside the MLPs and train them data-parallel (the same
    # placement hybrid.init_hybrid_state gives plan-rank -1 tables).
    trick = {
        str(k): t for k, t in enumerate(params["emb"]) if isinstance(t, dict)
    }
    if trick:
        non_emb["emb_trick"] = trick
    vw = None
    if config.weighted_pooling is not None:
        v_W = non_emb.pop("v_W")
        vw = pack_rows_vw(v_W, plan, mesh, axis)
        if trick:
            # trick tables' pooling weights replicate next to their tables;
            # "learned" ones train through the trick recompute's autodiff
            # (dp-channel pmean), "fixed" ones are stop-gradded in the step
            non_emb["vw_trick"] = {k: v_W[int(k)] for k in trick}
    mlp = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), non_emb)
    qstate = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(config)
    )
    return RowShardState(mega=mega, mlp=mlp, qstate=qstate, vw=vw)


def _partial_pooled(
    block: jax.Array,  # [chunk, D] this device's rows
    gids: jax.Array,  # [T, B, P] GLOBAL row ids
    mask: Optional[jax.Array],
    me: jax.Array,
    chunk: int,
    vw_block: Optional[jax.Array] = None,  # [chunk] pooling weights
    table_valid: Optional[jax.Array] = None,  # [T] bool: False = trick table
) -> jax.Array:  # [T, B, D] partial sums from owned rows only
    local = gids - me * chunk
    owned = (local >= 0) & (local < chunk)
    if table_valid is not None:
        # QR/MD tables have no rows here; their partials must be exactly 0
        # (they are spliced from the replicated recompute downstream)
        owned = owned & table_valid[:, None, None]
    safe = jnp.clip(local, 0, chunk - 1)
    rows = jnp.take(block, safe, axis=0)  # [T,B,P,D]
    w = owned.astype(rows.dtype)
    if vw_block is not None:
        # per_sample_weights = v_W[row] (dlrm_s_pytorch.py:417-448); each
        # row's weight lives on the device that owns the row
        w = w * jnp.take(vw_block, safe).astype(rows.dtype)
    if mask is not None:
        w = w * mask.astype(rows.dtype)
    return jnp.sum(rows * w[..., None], axis=2)


def _pact_segments_rows(
    plan: RowShardPlan, table_sizes: Tuple[int, ...]
) -> np.ndarray:
    """[n_dev, chunk] global table id per mega row (T for pad rows) for the
    per-table DoReFa normalization (see hybrid._pact_segments)."""
    T = len(table_sizes)
    segs = np.full(plan.n_dev * plan.chunk, T, np.int32)
    for k in range(T):
        if plan.dense_mask is not None and not bool(plan.dense_mask[k]):
            continue
        b = int(plan.table_base[k])
        segs[b : b + int(table_sizes[k])] = k
    return segs.reshape(plan.n_dev, plan.chunk)


def _trick_pooled_slice(
    config: DLRMConfig,
    trick_p: dict,  # {str(k): trick params} (differentiable)
    vw_trick: Optional[dict],  # {str(k): [n_k] weights} or None
    batch: dlrm.Batch,
    me: jax.Array,
    b_local: int,
    trick_ks,
) -> dict:
    """Pooled outputs of the replicated QR/MD tables on THIS device's batch
    slice: {k: [b_local, D]}. Autodiff through this routes trick-table (and
    learned v_W) gradients onto the DDP pmean channel — the same placement
    as hybrid._assemble_pooled's trick branch."""
    start = me * b_local
    out = {}
    for k in sorted(trick_ks):
        idx_k = jax.lax.dynamic_slice_in_dim(batch.indices[k], start, b_local, 0)
        m_k = None
        if batch.mask is not None:
            m_k = jax.lax.dynamic_slice_in_dim(batch.mask[k], start, b_local, 0)
        if vw_trick is not None:
            # per_sample_weights = v_W[idx] (dlrm_s_pytorch.py:417-448)
            w_rows = jnp.take(vw_trick[str(k)], idx_k, axis=0)
            m_k = w_rows if m_k is None else m_k * w_rows
        out[k] = dlrm.trick_pooled_lookup(
            config, trick_p[str(k)], idx_k, m_k
        ).astype(jnp.float32)
    return out


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
        # scalar extrema in f32 (bf16 blocks: min/max is exact in the
        # block dtype; only the scalars convert — see hybrid._slot_scales)
        mins.append(
            jnp.min(jnp.where(in_tbl, row_min, jnp.inf)).astype(jnp.float32)
        )
        maxs.append(
            jnp.max(jnp.where(in_tbl, row_max, -jnp.inf)).astype(jnp.float32)
        )
    return jnp.stack(mins), jnp.stack(maxs)


def make_rowshard_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: RowShardPlan,
    axis: str = "mp",
    has_mask: bool = False,
    steps_per_dispatch: int = 1,
    use_scan: bool = True,
):
    """Row-sharded hybrid train step (see module docstring).

    steps_per_dispatch > 1 runs k steps in one dispatch (list of k batches
    or a stacked leading-[k] Batch); `use_scan` (default) puts them in a
    `lax.scan` inside the shard_map — see comm_grad.make_dp_train_step.

    Batch layout matches make_hybrid_train_step: dense/labels batch-sharded
    on `axis`, indices/mask replicated. QR/MD trick tables ride replicated
    next to the MLPs (state.mlp["emb_trick"]) and train data-parallel.
    """
    from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q

    qc = config.quant
    pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
    if pact and config.weighted_pooling == "learned":
        raise NotImplementedError(
            "quant_scheme='pact' + weighted_pooling='learned' is not "
            "supported by the mega-table engines; use parallelism=none/dp"
        )
    pact_segs = (
        jnp.asarray(_pact_segments_rows(plan, config.table_sizes))
        if pact
        else None
    )
    n_dev = plan.n_dev
    chunk = plan.chunk
    table_base = jnp.asarray(plan.table_base)
    learned_vw = config.weighted_pooling == "learned"
    trick_ks = frozenset(
        k for k in range(config.num_tables) if config.table_kind(k) != "dense"
    )
    dense_sel = (
        jnp.asarray(np.asarray(plan.dense_mask, bool)) if trick_ks else None
    )

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
            computed = q.symmetric_quantization_params(
                qc.embedding_bit, g_min, g_max
            )
            if dense_sel is not None:
                # QR/MD tables stay full-precision: placeholder scale 1.0
                # (dlrm.compute_emb_scales parity; their base-0 row ranges
                # above alias dense rows and must be ignored)
                computed = jnp.where(dense_sel, computed, 1.0)
            new_scales = jnp.where(do_update, computed, qstate.emb_scales)
            qstate = qstate._replace(emb_scales=new_scales)

        vw_block = (
            jax.lax.stop_gradient(state.vw) if state.vw is not None else None
        )
        gather_block = jax.lax.stop_gradient(block)
        if pact:
            # per-table DoReFa weight fake-quant BEFORE the gather; tables
            # SPAN chunks here, so the per-table normalizer max|tanh| is a
            # cross-device pmax of local segment maxima. Identity STE
            # keeps the raw-block scatter update exact (see
            # hybrid.make_hybrid_train_step).
            th = jnp.tanh(gather_block)
            local_max = q.pact_segment_absmax(
                th, pact_segs[me], config.num_tables
            )
            gmax = jax.lax.pmax(local_max, axis)
            gather_block = q.pact_apply_segmented(
                th, qc.embedding_bit, pact_segs[me], config.num_tables, gmax
            )
        partial = _partial_pooled(
            gather_block, gids, batch.mask, me, chunk,
            vw_block, dense_sel,
        )  # [T, B, D]

        def loss_fn(mlp_p, p_partial):
            # Complete the partial sums AND shard the batch in one
            # collective: psum_scatter over the batch dim -> [T, B/n, D].
            raw_pooled = jax.lax.psum_scatter(
                p_partial, axis, scatter_dimension=1, tiled=True
            )
            if trick_ks:
                # splice the replicated QR/MD pooled outputs (computed on
                # this device's batch slice from DIFFERENTIABLE params) over
                # their zeroed mega-table slots
                vw_trick = mlp_p.get("vw_trick")
                if vw_trick is not None and not learned_vw:
                    vw_trick = jax.lax.stop_gradient(vw_trick)
                tp = _trick_pooled_slice(
                    config, mlp_p["emb_trick"], vw_trick, batch, me,
                    raw_pooled.shape[1], trick_ks,
                )
                raw_pooled = jnp.stack(
                    [
                        tp[k] if k in trick_ks else raw_pooled[k]
                        for k in range(config.num_tables)
                    ]
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
                # LSQ step grads: global-batch numel makes the DDP pmean
                # exactly batch-size-invariant (quant.fake_quant_lsq)
                lsq_numel_scale=float(mesh.shape[axis]),
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
        if dense_sel is not None:
            # trick tables: g_partial is identically 0 (the splice cut
            # them out of the psum_scatter path) but their base-0 gids
            # ALIAS dense rows — drop them from the scatter outright
            owned = owned & dense_sel[:, None, None]
        rows_idx = jnp.where(owned, local, chunk)  # chunk = dropped
        safe = jnp.clip(local, 0, chunk - 1)
        T, B, Pp = batch.indices.shape
        vals = jnp.broadcast_to(
            g_partial[:, :, None, :], (T, B, Pp, g_partial.shape[-1])
        )
        base_m = None
        if batch.mask is not None:
            base_m = batch.mask.astype(vals.dtype)
        new_vw = state.vw
        if vw_block is not None:
            # d pooled / d row = v_W[row]; learned v_W additionally gets the
            # per-occurrence scalar grad g_partial . E[row], scattered into
            # the OWNED rows of the local vw shard (see hybrid.py).
            w = jnp.take(vw_block, safe)  # [T, B, P]
            if learned_vw:
                rows_e = jnp.take(block, safe, axis=0)  # [T, B, P, D]
                contrib = jnp.einsum("tbd,tbpd->tbp", g_partial, rows_e)
                if base_m is not None:
                    contrib = contrib * base_m
                new_vw = state.vw.at[rows_idx.reshape(-1)].add(
                    -(lr / n_dev) * contrib.reshape(-1), mode="drop"
                )
            vals = vals * w[..., None].astype(vals.dtype)
        if base_m is not None:
            vals = vals * base_m[..., None]
        new_block = block.at[rows_idx.reshape(-1)].add(
            # cast AFTER scaling (see parallel/hybrid.py: f32 lr would
            # promote the update back to f32 -> full-block convert)
            (-(lr / n_dev) * vals.reshape(-1, vals.shape[-1])).astype(
                block.dtype
            ),
            mode="drop",
        )

        new_qs = new_qs._replace(step=qstate.step + 1)
        return RowShardState(new_block, new_mlp, new_qs, new_vw), mean_loss

    batch_specs = dlrm.Batch(
        dense=P(axis),
        indices=P(),
        labels=P(axis),
        mask=P() if has_mask else None,
    )
    state_specs = RowShardState(
        mega=P(axis), mlp=P(), qstate=P(),
        vw=P(axis) if config.weighted_pooling is not None else None,
    )

    if steps_per_dispatch > 1:
        if use_scan:
            # scan-in-shard_map megastep (see comm_grad.make_dp_train_step)
            stacked_specs = dlrm.Batch(
                dense=P(None, axis),
                indices=P(),
                labels=P(None, axis),
                mask=P() if has_mask else None,
            )

            def device_scan(state: RowShardState, stacked: dlrm.Batch):
                state, losses = jax.lax.scan(device_step, state, stacked)
                return state, losses[-1]

            step = jax.jit(
                shard_map(
                    device_scan,
                    mesh=mesh,
                    in_specs=(state_specs, stacked_specs),
                    out_specs=(state_specs, P()),
                    check_vma=False,
                ),
                donate_argnums=(0,),
            )

            def run(state: RowShardState, batches):
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    stack_batches,
                )

                if not isinstance(batches, dlrm.Batch):
                    batches = stack_batches(list(batches))
                return step(state, batches)

            run.lower = step.lower  # AOT inspection (plot-compute-graph)
            return run

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
    trick_ks = frozenset(
        k for k in range(config.num_tables) if config.table_kind(k) != "dense"
    )
    dense_sel = (
        jnp.asarray(np.asarray(plan.dense_mask, bool)) if trick_ks else None
    )

    from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as _q

    qc = config.quant
    pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
    pact_segs = (
        jnp.asarray(_pact_segments_rows(plan, config.table_sizes))
        if pact
        else None
    )

    def device_eval(state: RowShardState, batch: dlrm.Batch) -> jax.Array:
        me = jax.lax.axis_index(axis)
        gids = batch.indices + table_base[:, None, None]
        mega = state.mega
        if pact:
            th = jnp.tanh(mega)
            gmax = jax.lax.pmax(
                _q.pact_segment_absmax(th, pact_segs[me], config.num_tables),
                axis,
            )
            mega = _q.pact_apply_segmented(
                th, qc.embedding_bit, pact_segs[me], config.num_tables, gmax
            )
        partial = _partial_pooled(
            mega, gids, batch.mask, me, chunk, state.vw, dense_sel
        )
        raw_pooled = jax.lax.psum_scatter(
            partial, axis, scatter_dimension=1, tiled=True
        )
        if trick_ks:
            tp = _trick_pooled_slice(
                config, state.mlp["emb_trick"], state.mlp.get("vw_trick"),
                batch, me, raw_pooled.shape[1], trick_ks,
            )
            raw_pooled = jnp.stack(
                [
                    tp[k] if k in trick_ks else raw_pooled[k]
                    for k in range(config.num_tables)
                ]
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
    state_specs = RowShardState(
        mega=P(axis), mlp=P(), qstate=P(),
        vw=P(axis) if config.weighted_pooling is not None else None,
    )
    fn = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)
