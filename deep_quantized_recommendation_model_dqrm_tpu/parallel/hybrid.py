"""Hybrid parallelism: table-sharded embeddings + data-parallel MLPs.

TPU-native re-design of the reference's hybrid drivers
(dlrm_s_pytorch_hybrid_multi_gpu.py:819-945 `distributed_forward`,
dlrm_s_pytorch_quantization_tr_two.py, dlrm_s_pytorch_hp_with_quantization.py):
each rank owns a subset of the 26 embedding tables, looks up the FULL batch
for its local tables, then an all-to-all swaps table-major to batch-major so
every rank ends with all tables' pooled outputs for its batch slice; MLPs are
replicated and data-parallel (DDP -> gradient pmean).

TPU mapping, all inside ONE jitted `shard_map` over a 1-D `mp` axis:

- tables are packed into a row-concatenated **mega-table** of shape
  [n_dev * block_rows, D], row-sharded over the mesh axis. Packing balances
  rows across devices (greedy LPT — better than the reference's contiguous
  `get_my_slice` split, which is badly skewed by the 10M-row tables); each
  device block ends with one zero pad row that dummy slots point at.
- per-device lookups use static [n_dev, Tmax] table-id/base tables indexed by
  `axis_index`, producing pooled [Tmax, B, D];
- `jax.lax.all_to_all` (split on batch, concat on tables) replaces the
  hand-rolled async All2All_Req/Wait autograd functions
  (extend_distributed.py:197-490). XLA's latency-hiding scheduler overlaps it
  with the bottom MLP — the reference's request-before-mlp/wait-after trick
  (hybrid_multi_gpu.py:866-870) for free;
- backward: autodiff through the all-to-all routes each pooled-output
  gradient back to the owning device; embedding updates are local
  scatter-adds (tables are sharded, so no gradient reduction — exactly like
  DDP excluding the embeddings, hybrid_multi_gpu.py:1840-1845);
- MLP gradients are pmean'd (DDP all-reduce).
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


class TableShardingPlan(NamedTuple):
    """Static metadata for the mega-table packing (host-side numpy)."""

    n_dev: int
    block_rows: int  # rows per device block (incl. final zero pad row)
    t_max: int  # max tables per device (slots padded with -1)
    table_rank: np.ndarray  # [T] owning device of each table
    table_slot: np.ndarray  # [T] slot index within the owner
    table_base: np.ndarray  # [T] row offset of the table within its block
    local_ids: np.ndarray  # [n_dev, t_max] table id per slot (-1 = dummy)
    local_base: np.ndarray  # [n_dev, t_max] base row per slot (pad row for dummies)
    perm: np.ndarray  # [T] position of table k in the all-to-all output


def plan_table_sharding(
    table_sizes: Tuple[int, ...],
    n_dev: int,
    strategy: str = "greedy",
    kinds: Optional[Tuple[str, ...]] = None,
) -> TableShardingPlan:
    """Assign tables to devices and lay out per-device row blocks.

    strategy="greedy": longest-processing-time row balancing.
    strategy="contiguous": the reference's `get_my_slice` contiguous split
    (dlrm_s_pytorch.py:243-245) for exact-parity experiments.
    strategy="roundrobin": the reference's single-node placement
    (table k -> device k % n, dlrm_s_pytorch.py:617-733 parallel_forward).

    `kinds` (config.table_kind per table): non-"dense" (QR/MD compositional)
    tables are excluded from the mega-table — they get table_rank/perm -1 and
    are carried REPLICATED by the hybrid step (they are small by construction,
    that being their entire point), trained data-parallel like the MLPs.
    """
    T = len(table_sizes)
    dense = [k for k in range(T) if kinds is None or kinds[k] == "dense"]
    dense_set = set(dense)
    if strategy == "contiguous":
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import (
            table_assignment,
        )

        groups: List[List[int]] = table_assignment(len(dense), n_dev)
        per_rank = [[dense[i] for i in g] for g in groups]
    elif strategy == "roundrobin":
        per_rank = [[] for _ in range(n_dev)]
        for i, k in enumerate(dense):
            per_rank[i % n_dev].append(k)
    else:
        sizes = np.asarray([table_sizes[k] for k in dense], np.int64)
        order = np.argsort(-sizes, kind="stable")
        loads = np.zeros(n_dev, np.int64)
        per_rank = [[] for _ in range(n_dev)]
        for i in order:
            r = int(np.argmin(loads))
            per_rank[r].append(dense[int(i)])
            loads[r] += sizes[i]
        # keep original table order within a rank for readability
        per_rank = [sorted(g) for g in per_rank]

    t_max = max(max((len(g) for g in per_rank), default=1), 1)
    table_rank = np.full(T, -1, np.int32)
    table_slot = np.zeros(T, np.int32)
    table_base = np.zeros(T, np.int64)
    local_ids = np.full((n_dev, t_max), -1, np.int32)
    rank_rows = np.zeros(n_dev, np.int64)
    for r, group in enumerate(per_rank):
        off = 0
        for s, k in enumerate(group):
            table_rank[k] = r
            table_slot[k] = s
            table_base[k] = off
            local_ids[r, s] = k
            off += table_sizes[k]
        rank_rows[r] = off
    block_rows = int(rank_rows.max()) + 1  # +1 zero pad row
    local_base = np.full((n_dev, t_max), block_rows - 1, np.int64)
    for k in dense_set:
        local_base[table_rank[k], table_slot[k]] = table_base[k]
    perm = (table_rank.astype(np.int64) * t_max + table_slot).astype(np.int32)
    perm[table_rank < 0] = -1  # trick tables: not in the all-to-all
    return TableShardingPlan(
        n_dev=n_dev,
        block_rows=block_rows,
        t_max=t_max,
        table_rank=table_rank,
        table_slot=table_slot,
        table_base=table_base,
        local_ids=local_ids,
        local_base=local_base,
        perm=perm,
    )


def pack_tables(
    tables: List[jax.Array],
    plan: TableShardingPlan,
    mesh: Optional[Mesh] = None,
    axis: str = "mp",
) -> jax.Array:
    """Pack per-table arrays into the row-sharded mega-table
    [n_dev * block_rows, D]. With a mesh, the result is placed with
    NamedSharding(P(axis)) so each block lives on its owner device.
    QR/MD dict entries (plan.table_rank -1) are skipped — the hybrid step
    carries them replicated."""
    arrays = [t for t in tables if not isinstance(t, dict)]
    if arrays:
        D, dt = arrays[0].shape[-1], arrays[0].dtype
    else:
        # every table is QR/MD: keep a 1-wide placeholder so the step's
        # shard_map structure (and the all-to-all) stays uniform
        D, dt = 1, jnp.float32
    mega = jnp.zeros((plan.n_dev * plan.block_rows, D), dt)
    for k, t in enumerate(tables):
        if isinstance(t, dict):
            continue
        start = int(plan.table_rank[k]) * plan.block_rows + int(plan.table_base[k])
        mega = jax.lax.dynamic_update_slice(mega, t, (start, 0))
    if mesh is not None:
        mega = jax.device_put(mega, NamedSharding(mesh, P(axis)))
    return mega


def pack_vw(
    v_W: List[jax.Array],
    plan: TableShardingPlan,
    mesh: Optional[Mesh] = None,
    axis: str = "mp",
) -> jax.Array:
    """Pack per-table pooling-weight vectors [n_k] into the mega-table row
    layout as one [n_dev*block_rows] vector (pad/dummy rows weight 0). Trick
    tables (plan rank -1) are skipped — their v_W replicate next to the
    trick tables as `vw_trick` (init_hybrid_state; upstream rejects the
    combination outright, dlrm_s_pytorch.py:1040-1044 — our dp engines and
    this step both support it)."""
    packed = pack_tables(
        [
            v[:, None] if int(plan.table_rank[k]) >= 0 else {}
            for k, v in enumerate(v_W)
        ],
        plan,
    )[:, 0]
    if mesh is not None:
        packed = jax.device_put(packed, NamedSharding(mesh, P(axis)))
    return packed


def unpack_vw(
    vw: jax.Array, plan: TableShardingPlan, table_sizes: Tuple[int, ...]
) -> List[Optional[jax.Array]]:
    """Inverse of pack_vw (trick-table slots come back as None)."""
    cols = unpack_tables(vw[:, None], plan, table_sizes)
    return [c[:, 0] if c is not None else None for c in cols]


def unpack_tables(
    mega: jax.Array, plan: TableShardingPlan, table_sizes: Tuple[int, ...]
) -> List[jax.Array]:
    """Inverse of pack_tables (for checkpointing / eval on one chip).
    Trick-table slots (plan.table_rank -1, not in the mega-table) come back
    as None — callers splice the replicated dict entries in."""
    out = []
    for k, rows in enumerate(table_sizes):
        if int(plan.table_rank[k]) < 0:
            out.append(None)
            continue
        start = int(plan.table_rank[k]) * plan.block_rows + int(plan.table_base[k])
        out.append(jax.lax.dynamic_slice(mega, (start, 0), (rows, mega.shape[1])))
    return out


def _assemble_pooled(
    config: DLRMConfig,
    plan: TableShardingPlan,
    perm_j: jax.Array,
    swapped: jax.Array,  # [n_dev*t_max, B/n, D] post-a2a, batch-major
    trick_p: Optional[dict],
    batch: dlrm.Batch,
    me: jax.Array,
    vw_trick: Optional[dict] = None,  # {str(k): [n_k]} trick pooling weights
) -> jax.Array:  # [T, B/n, D]
    """Batch-major pooled outputs for every table: dense tables from the
    all-to-all, QR/MD compositional tables computed locally from the
    REPLICATED params on this device's batch slice (plan gives them rank -1
    — they are small by construction, so replicating them and training them
    data-parallel like the MLPs is the TPU-native placement; autodiff
    through this lookup routes their gradients onto the DDP channel)."""
    trick_ks = [
        k for k in range(config.num_tables) if int(plan.table_rank[k]) < 0
    ]
    if not trick_ks:
        return jnp.take(swapped, perm_j, axis=0)
    trick_set = set(trick_ks)
    b_local = swapped.shape[1]
    start = me * b_local
    parts = []
    for k in range(config.num_tables):
        if k in trick_set:
            idx_k = jax.lax.dynamic_slice_in_dim(batch.indices[k], start, b_local, 0)
            m_k = None
            if batch.mask is not None:
                m_k = jax.lax.dynamic_slice_in_dim(batch.mask[k], start, b_local, 0)
            if vw_trick is not None:
                # per_sample_weights = v_W[idx] (dlrm_s_pytorch.py:417-448)
                w_rows = jnp.take(vw_trick[str(k)], idx_k, axis=0)
                m_k = w_rows if m_k is None else m_k * w_rows
            parts.append(
                dlrm.trick_pooled_lookup(config, trick_p[str(k)], idx_k, m_k).astype(
                    jnp.float32
                )
            )
        else:
            parts.append(swapped[int(plan.perm[k])])
    return jnp.stack(parts)



def _pact_segments(
    plan: TableShardingPlan, table_sizes: Tuple[int, ...]
) -> np.ndarray:
    """[n_dev, block_rows] global table id of each mega-block row (T for
    pad/gap rows) — drives the per-table DoReFa normalization
    (quant.fake_quant_pact_segmented) under shard_map, where per-device
    table boundaries are traced and cannot be static slice bounds."""
    T = len(table_sizes)
    segs = np.full((plan.n_dev, plan.block_rows), T, np.int32)
    for k in range(T):
        r = int(plan.table_rank[k])
        if r < 0:
            continue
        b = int(plan.table_base[k])
        segs[r, b : b + int(table_sizes[k])] = k
    return segs


def _mega_layout_spec(mesh: Mesh, axis: str):
    """in/out-shardings pytree pinning ONLY the mega-table leaf row-major
    (comm_grad._pin_format semantics; vw is 1-D so layout is trivial and
    stays unconstrained)."""
    from jax.experimental.layout import Format, Layout

    fmt = Format(
        Layout(major_to_minor=(0, 1)), NamedSharding(mesh, P(axis))
    )
    return HybridState(
        mega=fmt, mlp=None, qstate=None, vw=None
    )


def pack_tables_pinned_streaming(
    tables,  # HOST numpy per-table arrays (QR/MD dicts skipped)
    plan: TableShardingPlan,
    mesh: Mesh,
    axis: str = "mp",
    chunk_rows: int = 2_000_000,
) -> jax.Array:
    """Build the mega-table DIRECTLY in the pinned row-major layout by
    streaming host chunks into a DONATED dynamic_update_slice — device
    peak is pinned-mega + one chunk. The alternative (pack_tables then
    pin_mega_state) transiently holds compact + padded copies, which OOMs
    a 16 GB chip at Terabyte scale (12.6 GB pinned + 6.3 compact)."""
    from jax.experimental.layout import Format, Layout

    arrays = [t for t in tables if not isinstance(t, dict)]
    if arrays:
        D = arrays[0].shape[-1]
        dt = jnp.bfloat16 if str(arrays[0].dtype) == "bfloat16" else jnp.float32
    else:
        D, dt = 1, jnp.float32
    fmt = Format(
        Layout(major_to_minor=(0, 1)), NamedSharding(mesh, P(axis))
    )
    mega = jax.jit(
        lambda: jnp.zeros((plan.n_dev * plan.block_rows, D), dt),
        out_shardings=fmt,
    )()
    mega.block_until_ready()
    insert = jax.jit(
        lambda m, t, s: jax.lax.dynamic_update_slice(m, t.astype(m.dtype), (s, 0)),
        donate_argnums=(0,),
        in_shardings=(fmt, None, None),
        out_shardings=fmt,
    )
    for k, t in enumerate(tables):
        if isinstance(t, dict):
            continue
        base = int(plan.table_rank[k]) * plan.block_rows + int(plan.table_base[k])
        n = t.shape[0]
        for off in range(0, n, chunk_rows):
            c = jnp.asarray(np.asarray(t[off : off + chunk_rows]))
            mega = insert(mega, c, base + off)
            mega.block_until_ready()
            if hasattr(c, "delete"):
                c.delete()
    return mega


def pin_mega_state(state: "HybridState", mesh: Mesh, axis: str = "mp"):
    """Relayout the mega-table to row-major, freeing the compact original
    (the Terabyte-scale compact + padded copies cannot coexist — pin small
    models only, or build the mega pinned per-block like bench scripts)."""
    from jax.experimental.layout import Format, Layout

    fmt = Format(
        Layout(major_to_minor=(0, 1)), NamedSharding(mesh, P(axis))
    )
    mega = jax.device_put(state.mega, fmt)
    mega.block_until_ready()
    state.mega.delete()
    return state._replace(mega=mega)


class HybridState(NamedTuple):
    mega: jax.Array  # [n_dev*block_rows, D] row-sharded embedding mega-table
    mlp: Any  # replicated MLP params {"bot": [...], "top": [...]}
    qstate: dlrm.QuantState
    # Pooling weights v_W packed in the mega-table row layout
    # [n_dev*block_rows], row-sharded like `mega`; None unless
    # config.weighted_pooling is set. "fixed" weights are applied but never
    # updated; "learned" ones train via the local sparse scatter-add
    # (upstream apply_emb per_sample_weights, dlrm_s_pytorch.py:417-448).
    vw: Any = None


def init_hybrid_state(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: TableShardingPlan,
    axis: str = "mp",
    seed: Optional[int] = None,
    pin_mega_layout: bool = False,
) -> HybridState:
    params = dlrm.init_params(
        config, seed if seed is not None else tc.seed,
        # pinned path: dense tables stay HOST numpy (bit-identical) so the
        # streaming build never holds a full device copy next to the
        # pinned mega (12.6 + 6.3 GB would OOM a 16 GB chip at Terabyte)
        host_emb=pin_mega_layout,
    )
    if pin_mega_layout:
        # stream host tables into a DONATED pinned mega (device peak =
        # pinned mega + one chunk; pack-then-pin would OOM at Terabyte)
        mega = pack_tables_pinned_streaming(params["emb"], plan, mesh, axis)
    else:
        mega = pack_tables(params["emb"], plan, mesh, axis)
    # MLPs + quant state are explicitly replicated over the mesh so their
    # shardings survive checkpoint round-trips (Orbax restores into the
    # `like` arrays' shardings; an uncommitted array would come back pinned
    # to device 0 and clash with the sharded mega-table).
    rep = NamedSharding(mesh, P())
    non_emb = {k: v for k, v in params.items() if k != "emb"}
    # QR/MD compositional tables are small by construction: carry them
    # REPLICATED alongside the MLPs and train them data-parallel (their
    # gradients ride the DDP-style pmean, hybrid_multi_gpu.py:1840-1845).
    trick = {
        str(k): t for k, t in enumerate(params["emb"]) if isinstance(t, dict)
    }
    if trick:
        non_emb["emb_trick"] = trick
    vw = None
    if config.weighted_pooling is not None:
        v_W = non_emb.pop("v_W")
        vw = pack_vw(v_W, plan, mesh, axis)
        if trick:
            # trick tables' pooling weights replicate next to their tables
            # ("learned" ones train through the trick recompute's autodiff
            # and ride the DDP pmean; "fixed" ones are stop-gradded in the
            # step). Upstream rejects weighted pooling + QR/MD outright
            # (dlrm_s_pytorch.py:1040-1044); the dp engines here support
            # it, so the hybrid step matches them.
            non_emb["vw_trick"] = {k: v_W[int(k)] for k in trick}
    mlp = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), non_emb)
    qstate = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dlrm.init_quant_state(config)
    )
    return HybridState(mega=mega, mlp=mlp, qstate=qstate, vw=vw)


def _local_pooled(
    block: jax.Array,  # [block_rows, D] this device's rows
    indices: jax.Array,  # [T, B, P] full batch, replicated
    mask: Optional[jax.Array],
    local_ids: jax.Array,  # [t_max]
    local_base: jax.Array,  # [t_max]
    vw_block: Optional[jax.Array] = None,  # [block_rows] pooling weights
) -> jax.Array:  # [t_max, B, D]
    """Pooled lookups for this device's table slots over the full batch
    (the reference's `apply_emb(local tables, FULL batch)`,
    hybrid_multi_gpu.py:853). With `vw_block`, rows are scaled by their
    packed per-row pooling weight (per_sample_weights semantics,
    dlrm_s_pytorch.py:417-448; the pad row's weight is 0)."""
    safe_ids = jnp.maximum(local_ids, 0)
    idx = jnp.take(indices, safe_ids, axis=0)  # [t_max, B, P]
    valid = (local_ids >= 0)[:, None, None]
    # Dummy slots resolve to the zero pad row at local_base (= block_rows-1).
    rows_idx = jnp.where(valid, idx, 0) + local_base[:, None, None]
    rows = jnp.take(block, rows_idx, axis=0)  # [t_max, B, P, D]
    if vw_block is not None:
        w = jnp.take(vw_block, rows_idx)  # [t_max, B, P]
        rows = rows * w[..., None].astype(rows.dtype)
    if mask is not None:
        m = jnp.take(mask, safe_ids, axis=0)
        rows = rows * m[..., None].astype(rows.dtype)
    return jnp.sum(rows, axis=2)  # [t_max, B, D]


def make_hybrid_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    plan: TableShardingPlan,
    axis: str = "mp",
    has_mask: bool = False,
    steps_per_dispatch: int = 1,
    use_scan: bool = True,
    pin_mega_layout: bool = False,
):
    """Build the jitted hybrid-parallel train step.

    steps_per_dispatch > 1 runs k steps in one dispatch (takes a LIST of
    k batches or one stacked leading-[k] Batch); with `use_scan` (default)
    they ride `lax.scan` inside the shard_map so compile time is O(1) in k
    — see comm_grad.make_dp_train_step.

    `pin_mega_layout`: constrain the mega-table's in/out layout to
    row-major (comm_grad._pin_format semantics): XLA stores [n, d] arrays
    column-major at rest but the embedding scatter wants row-major, so an
    unpinned Terabyte-scale mega-table pays two full-array conversion
    copies per dispatch. Pin the state's mega with `pin_mega_state` first.

    Input: (HybridState, Batch) where Batch.dense/labels are batch-sharded on
    `axis` and indices/mask are replicated (every device needs the full batch
    for its local tables). Output: (HybridState, mean loss).
    """
    qc = config.quant
    pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
    if pact and config.weighted_pooling == "learned":
        # learned v_W's analytic grad would need the FAKE-QUANTED rows;
        # keep this corner on parallelism none/dp (exact there)
        raise NotImplementedError(
            "quant_scheme='pact' + weighted_pooling='learned' is not "
            "supported by the mega-table engines; use parallelism=none/dp"
        )
    pact_segs = (
        jnp.asarray(_pact_segments(plan, config.table_sizes)) if pact else None
    )
    has_vw = config.weighted_pooling is not None
    learned_vw = config.weighted_pooling == "learned"
    n_dev = plan.n_dev
    local_ids_np = jnp.asarray(plan.local_ids)
    local_base_np = jnp.asarray(plan.local_base)
    perm = jnp.asarray(plan.perm)
    def assemble_pooled(swapped, trick_p, batch, me, vw_trick=None):
        return _assemble_pooled(
            config, plan, perm, swapped, trick_p, batch, me, vw_trick
        )

    def device_step(state: HybridState, batch: dlrm.Batch):
        me = jax.lax.axis_index(axis)
        block = state.mega  # [block_rows, D] local shard inside shard_map
        my_local_ids = local_ids_np[me]
        my_local_base = local_base_np[me]
        qstate = state.qstate

        def _slot_scales(blk, lids, lbase):
            """Per-slot table-wide scales from this device's block.

            One [block_rows, D] pass produces per-row min/max; each slot then
            reduces its contiguous [base_s, base_{s+1}) row range on the
            [block_rows] vectors — the TPU equivalent of the reference's
            whole-table min/max scan (quant_utils.py:141-194), at one HBM
            read for ALL local tables instead of one per table.
            """
            from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q

            row_min = jnp.min(blk, axis=1)  # [block_rows]
            row_max = jnp.max(blk, axis=1)
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (blk.shape[0], 1), 0
            ).squeeze(-1)
            scales = []
            end = jnp.asarray(blk.shape[0] - 1, lbase.dtype)  # pad row
            for s in range(plan.t_max):
                base = lbase[s]
                nxt = lbase[s + 1] if s + 1 < plan.t_max else end
                in_tbl = (row_ids >= base) & (row_ids < nxt)
                # reduce in the block's own dtype; convert only the SCALAR
                # extrema to f32 (bf16 min/max is exact; a full f32 block
                # copy would cost GBs at Terabyte scale — see
                # dlrm.compute_emb_scales NOTE)
                w_min = jnp.min(
                    jnp.where(in_tbl, row_min, jnp.inf)
                ).astype(jnp.float32)
                w_max = jnp.max(
                    jnp.where(in_tbl, row_max, -jnp.inf)
                ).astype(jnp.float32)
                valid = lids[s] >= 0
                w_min = jnp.where(valid, w_min, 0.0)
                w_max = jnp.where(valid, w_max, 0.0)
                scales.append(
                    q.symmetric_quantization_params(qc.embedding_bit, w_min, w_max)
                )
            return jnp.stack(scales)

        if qc.enabled:
            # Table-wide scales from the local block; each table lives on one
            # device, so compute per-slot scales locally and all-gather.
            # The (expensive, local) block scan sits under lax.cond; the
            # (cheap, [t_max]-float) all_gather runs unconditionally —
            # collectives must NOT live inside cond branches (branch
            # subcomputations get their own collective op-id namespace and
            # deadlock against main-body collectives).
            period = max(qc.scale_update_period, 1)
            do_update = (qstate.step % period) == 0
            slot_scales = jax.lax.cond(
                do_update,
                lambda: _slot_scales(block, my_local_ids, my_local_base),
                lambda: jnp.zeros((plan.t_max,), jnp.float32),
            )
            all_slot = jax.lax.all_gather(slot_scales, axis)  # [n_dev, t_max]
            new_scales = jnp.where(
                do_update, all_slot.reshape(-1)[perm], qstate.emb_scales
            )
            qstate = qstate._replace(emb_scales=new_scales)

        # ---- forward: local lookups -> all-to-all -> DLRM from pooled ----
        vw_block = (
            jax.lax.stop_gradient(state.vw) if state.vw is not None else None
        )
        gather_block = jax.lax.stop_gradient(block)
        if pact:
            # per-table DoReFa weight fake-quant BEFORE the gather (the
            # reference's lookup_all order, quant_pact_dorefa.py:97-105);
            # the identity STE makes the raw-block scatter below exact
            from deep_quantized_recommendation_model_dqrm_tpu.ops import (
                quant as _q,
            )

            gather_block = _q.fake_quant_pact_segmented(
                gather_block, qc.embedding_bit, pact_segs[me],
                config.num_tables,
            )
        pooled_local = _local_pooled(
            gather_block,
            batch.indices,
            batch.mask,
            my_local_ids,
            my_local_base,
            vw_block,
        )  # [t_max, B, D]

        def loss_fn(mlp_p, p_local):
            # table-major [t_max, B, D] -> batch-major [n_dev*t_max, B/n, D]
            if tc.a2a_quant_bits < 32:
                from deep_quantized_recommendation_model_dqrm_tpu.parallel.compressed_a2a import (
                    compressed_all_to_all,
                )

                swapped = compressed_all_to_all(
                    p_local, axis, tc.a2a_quant_bits, 1, 0
                )
            else:
                swapped = jax.lax.all_to_all(
                    p_local, axis, split_axis=1, concat_axis=0, tiled=True
                )
            vw_trick = mlp_p.get("vw_trick")
            if vw_trick is not None and not learned_vw:
                vw_trick = jax.lax.stop_gradient(vw_trick)
            raw_pooled = assemble_pooled(
                swapped, mlp_p.get("emb_trick"), batch, me, vw_trick
            )  # [T, B/n, D]
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

        (loss, new_qs), (mlp_grads, g_pooled_local) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.mlp, pooled_local)
        # g_pooled_local already includes every device's contribution (the
        # all-to-all transpose routed them here) = d(sum of device losses).

        mean_loss = jax.lax.pmean(loss, axis)
        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        # ---- MLP update: DDP-style gradient mean + SGD ----
        # The reference's hybrid drivers all-reduce MLP grads in fp32 via
        # DDP (hybrid_multi_gpu.py:1840-1845); with grad_quant_bits < 32 we
        # ride the DQRM compressed channel instead (INT8 psum over ICI),
        # combining both contributions in one step.
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

        # ---- Embedding update: local sparse scatter-add (grad of the sum
        # of losses, so divide by n_dev for the mean) ----
        B, Pp = batch.indices.shape[1], batch.indices.shape[2]
        safe_ids = jnp.maximum(my_local_ids, 0)
        idx = jnp.take(batch.indices, safe_ids, axis=0)  # [t_max, B, P]
        valid = (my_local_ids >= 0)[:, None, None]
        rows_idx = jnp.where(valid, idx, 0) + my_local_base[:, None, None]
        rows_idx = jnp.where(valid, rows_idx, block.shape[0])  # drop dummies
        vals = jnp.broadcast_to(
            g_pooled_local[:, :, None, :],
            (plan.t_max, B, Pp, g_pooled_local.shape[-1]),
        )
        base_m = None
        if batch.mask is not None:
            base_m = jnp.take(batch.mask, safe_ids, axis=0)  # [t_max, B, P]
        new_vw = state.vw
        if vw_block is not None:
            # d pooled / d row = v_W[row] * mask; learned v_W additionally
            # gets d pooled / d v_W[row] = mask * (g_pooled . E[row]) —
            # the same local sparse scatter-add as the tables (each row and
            # its weight live on this device; no reduction needed).
            safe_rows = jnp.clip(rows_idx, 0, block.shape[0] - 1)
            w = jnp.take(vw_block, safe_rows)  # [t_max, B, P]
            if learned_vw:
                rows_e = jnp.take(block, safe_rows, axis=0)  # [t_max,B,P,D]
                contrib = jnp.einsum("tbd,tbpd->tbp", g_pooled_local, rows_e)
                if base_m is not None:
                    contrib = contrib * base_m
                new_vw = state.vw.at[rows_idx.reshape(-1)].add(
                    -(lr / n_dev) * contrib.reshape(-1), mode="drop"
                )
            vals = vals * w[..., None].astype(vals.dtype)
        if base_m is not None:
            vals = vals * base_m[..., None].astype(vals.dtype)
        new_block = block.at[rows_idx.reshape(-1)].add(
            # cast AFTER scaling: f32 lr * bf16-cast vals promotes back to
            # f32 and XLA converts the whole block around the scatter
            (-(lr / n_dev) * vals.reshape(-1, vals.shape[-1])).astype(
                block.dtype
            ),
            mode="drop",
        )

        new_qs = new_qs._replace(step=qstate.step + 1)
        return HybridState(new_block, new_mlp, new_qs, new_vw), mean_loss

    batch_specs = dlrm.Batch(
        dense=P(axis),
        indices=P(),  # replicated: full batch needed for local tables
        labels=P(axis),
        mask=P() if has_mask else None,
    )
    state_specs = HybridState(
        mega=P(axis), mlp=P(), qstate=P(), vw=P(axis) if has_vw else None
    )

    def _jit_state_fn(fn):
        if not pin_mega_layout:
            return jax.jit(fn, donate_argnums=(0,))
        spec = _mega_layout_spec(mesh, axis)
        return jax.jit(
            fn, donate_argnums=(0,),
            in_shardings=(spec, None), out_shardings=(spec, None),
        )

    if steps_per_dispatch > 1:
        if use_scan:
            # scan-in-shard_map megastep (see comm_grad.make_dp_train_step):
            # collectives in the scan body, O(1) program size in k.
            stacked_specs = dlrm.Batch(
                dense=P(None, axis),
                indices=P(),  # replicated, leading [k] axis local
                labels=P(None, axis),
                mask=P() if has_mask else None,
            )

            def device_scan(state: HybridState, stacked: dlrm.Batch):
                state, losses = jax.lax.scan(device_step, state, stacked)
                return state, losses[-1]

            step = _jit_state_fn(
                shard_map(
                    device_scan,
                    mesh=mesh,
                    in_specs=(state_specs, stacked_specs),
                    out_specs=(state_specs, P()),
                    check_vma=False,
                )
            )

            def run(state: HybridState, batches):
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    stack_batches,
                )

                if not isinstance(batches, dlrm.Batch):
                    batches = stack_batches(list(batches))
                return step(state, batches)

            run.lower = step.lower  # AOT inspection (plot-compute-graph)
            return run

        def device_multi(state: HybridState, batches):
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
        return _jit_state_fn(step)

    step = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return _jit_state_fn(step)


def make_hybrid_eval_step(
    config: DLRMConfig,
    mesh: Mesh,
    plan: TableShardingPlan,
    axis: str = "mp",
    has_mask: bool = False,
    pin_mega_layout: bool = False,
):
    """Sharded inference over the hybrid state: tables STAY sharded (no
    single-chip unpack — Terabyte-scale tables may not fit one device);
    each device scores its batch slice after the all-to-all and the
    probabilities are all-gathered (`inference` logits all_gather,
    dlrm_s_pytorch.py:809). Returns probs for the FULL batch."""
    local_ids_np = jnp.asarray(plan.local_ids)
    local_base_np = jnp.asarray(plan.local_base)
    perm = jnp.asarray(plan.perm)
    qc = config.quant
    pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
    pact_segs = (
        jnp.asarray(_pact_segments(plan, config.table_sizes)) if pact else None
    )

    def device_eval(state: HybridState, batch: dlrm.Batch) -> jax.Array:
        me = jax.lax.axis_index(axis)
        mega = state.mega
        if pact:
            from deep_quantized_recommendation_model_dqrm_tpu.ops import (
                quant as _q,
            )

            mega = _q.fake_quant_pact_segmented(
                mega, qc.embedding_bit, pact_segs[me], config.num_tables
            )
        pooled_local = _local_pooled(
            mega, batch.indices, batch.mask,
            local_ids_np[me], local_base_np[me], state.vw,
        )
        swapped = jax.lax.all_to_all(
            pooled_local, axis, split_axis=1, concat_axis=0, tiled=True
        )
        raw_pooled = _assemble_pooled(
            config, plan, perm, swapped, state.mlp.get("emb_trick"), batch,
            me, state.mlp.get("vw_trick"),
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
    state_specs = HybridState(
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
    if pin_mega_layout:
        # accept the pinned row-major mega without a per-eval relayout
        # copy (12.6 GB at Terabyte scale)
        spec = _mega_layout_spec(mesh, axis)
        return jax.jit(fn, in_shardings=(spec, None))
    return jax.jit(fn)
