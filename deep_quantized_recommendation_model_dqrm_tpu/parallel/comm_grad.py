"""Data-parallel training with quantized + sparsified gradient communication.

The DQRM headline contribution (paper §3.3; reference driver
dlrm_s_pytorch_comm_grad.py:1934-1991 + sgd_quantized_gradients_parallel_comm
.py), re-designed for TPU ICI collectives inside one jitted `shard_map` step:

- the full model is replicated on every device of a 1-D `dp` mesh axis; each
  device computes gradients on its batch shard;
- **embedding gradients never densify**: autodiff is cut at the raw pooled
  lookups, so each table's gradient is the (indices, row-values) pair the
  reference carries as a sparse COO tensor
  (sgd_…_parallel_comm.py:257-320). The exchange is: all-reduce the INT8
  scale (mean), quantize rows to INT8, `all_gather` (ids, int8 rows) over
  ICI, then every replica applies the dequantized scatter-add update —
  byte-identical information to the reference's sparse all-reduce at
  1/4 the bytes of fp32, with no host round-trip;
- **MLP gradients**: per-channel INT8 quantize -> int32 `psum` -> dequantize
  (quantize_linear_grad/quantize_bias_grad, sgd_…_parallel_comm.py:892-961),
  with optional error-feedback residuals (sgd_quantized_gradients.py:570-630);
- **weight update** is the reference's manual SGD `weight_update_parallel_comm`
  (sgd_…_parallel_comm.py:601-685): w -= lr * dequantized_mean_grad;
- **periodic full-weight sync** every `weight_sync_period` steps bounds
  replica drift from nondeterministic scatter orders (`weight_syncc`,
  comm_grad.py:1977-1991) — a `psum`/N of all params under `lax.cond`.

Everything lives in ONE compiled step: XLA's latency-hiding scheduler
overlaps the gradient collectives with the backward compute, replacing the
reference's hand-rolled async request/wait objects (extend_distributed.py:
197-490).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
    coalesce_sparse_grads_batched,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
    dense_grad_auto,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.stream_update import (
    sort_sparse_grad,
    stream_update_auto,
)
from deep_quantized_recommendation_model_dqrm_tpu.optim import lr_policy
from deep_quantized_recommendation_model_dqrm_tpu.parallel import ranking_range


class DPState(NamedTuple):
    params: Any
    qstate: dlrm.QuantState
    # Error-feedback residuals for MLP grads (sgd_quantized_gradients.py:
    # 570-630), zeros when error_compensation is off.
    ec: Any


def _pin_format(mesh: Mesh):
    """Row-major replicated Format for pinning embedding-table layouts
    (see train_step.pin_params_layout for why: XLA stores [n, d] tables
    column-major at rest but the scatter wants row-major, so unpinned
    dispatches pay two full-model conversion copies — fatal at Terabyte
    scale)."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import NamedSharding

    return Format(Layout(major_to_minor=(0, 1)), NamedSharding(mesh, P()))


def pin_dp_state_layout(state: DPState, mesh: Mesh) -> DPState:
    """Relayout the dense embedding tables of a DPState to row-major, one
    at a time, FREEING each compact original before the next relayout
    (round-2 OOM lesson: Terabyte compact + padded copies cannot coexist).
    Takes ownership: every other reference to the old tables (e.g. a
    TrainState sharing the params) is invalidated — rebind them from the
    returned state immediately."""
    fmt = _pin_format(mesh)
    emb = list(state.params["emb"])
    for i, t in enumerate(emb):
        if isinstance(t, dict):
            continue  # QR/MD trick tables are small; leave default
        emb[i] = jax.device_put(t, fmt)
        emb[i].block_until_ready()
        t.delete()
    return state._replace(params={**state.params, "emb": emb})


def _dp_state_layout_spec(pin_state_template: DPState, mesh: Mesh):
    """in/out-shardings pytree pinning only the dense emb leaves."""
    fmt = _pin_format(mesh)
    spec = jax.tree_util.tree_map(lambda x: None, pin_state_template)
    emb_spec = [
        None if isinstance(t, dict) else fmt
        for t in pin_state_template.params["emb"]
    ]
    return spec._replace(params={**spec.params, "emb": emb_spec})


def dp_state_from(params: Any, qstate: dlrm.QuantState) -> DPState:
    """Wrap existing params (e.g. a TrainState's, possibly checkpoint-
    loaded) into a DPState WITHOUT re-initializing the model — at Terabyte
    scale a duplicate init would transiently double HBM."""
    ec = {
        "bot": [
            {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])}
            for l in params["bot"]
        ],
        "top": [
            {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])}
            for l in params["top"]
        ],
    }
    return DPState(params=params, qstate=qstate, ec=ec)


def init_dp_state(config: DLRMConfig, tc: TrainConfig, seed: Optional[int] = None) -> DPState:
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    return dp_state_from(params, dlrm.init_quant_state(config))


# ---------------------------------------------------------------------------
# Compressed collectives (inside shard_map)
# ---------------------------------------------------------------------------


def _mean_scale(scale: jax.Array, axis: str) -> jax.Array:
    """All-reduce-mean of quantization scales (sgd_…_parallel_comm.py:874-878:
    `all_reduce(scale); scale /= N`)."""
    return jax.lax.pmean(scale, axis)


def compressed_psum_dense(
    g: jax.Array, bits: int, axis: str, per_channel: bool
) -> jax.Array:
    """Dense gradient mean via INT-quantized psum.

    quantize_linear_grad / quantize_bias_grad semantics
    (sgd_…_parallel_comm.py:892-961): symmetric per-channel INT8 with the
    scale averaged across replicas first, then integer all-reduce, then
    dequantize and divide by world size. On TPU the int32 psum rides ICI at
    1/4 the fp32 bytes.
    """
    n_dev = jax.lax.psum(1, axis)
    if per_channel and g.ndim == 2:
        s_local = q.symmetric_quantization_params(
            bits, jnp.min(g, axis=1), jnp.max(g, axis=1)
        )
    else:
        s_local = q.symmetric_quantization_params(bits, jnp.min(g), jnp.max(g))
    s = _mean_scale(s_local, axis)
    g_int = q.quantize(g, s, bits).astype(jnp.int32)
    g_sum = jax.lax.psum(g_int, axis)
    return q.dequantize(g_sum, s) / n_dev


def compressed_psum_batched(tensors, bits, axis, per_channel_flags):
    """BIT-identical to mapping `compressed_psum_dense` over `tensors`,
    but with ONE scale pmean and ONE int32 psum for the whole list.

    Concatenation commutes with both collectives (pmean is elementwise;
    int32 psum is exact integer addition), so per-tensor quantize/
    dequantize sees exactly the same scales and sums — while a real mesh
    issues 2 collective launches instead of 2 per tensor (each launch is
    latency-bound; the dp engine has 12 MLP tensors). Returns the list of
    dequantized mean gradients.
    """
    n_dev = jax.lax.psum(1, axis)
    scales = []
    for g, pc in zip(tensors, per_channel_flags):
        if pc and g.ndim == 2:
            scales.append(
                q.symmetric_quantization_params(
                    bits, jnp.min(g, axis=1), jnp.max(g, axis=1)
                )
            )
        else:
            scales.append(
                q.symmetric_quantization_params(
                    bits, jnp.min(g), jnp.max(g)
                ).reshape(1)
            )
    sizes = [int(s.shape[0]) for s in scales]
    s_all = _mean_scale(jnp.concatenate(scales), axis)  # ONE pmean
    s_list, flats = [], []
    off = 0
    for g, pc, n in zip(tensors, per_channel_flags, sizes):
        s = s_all[off : off + n]
        off += n
        if not (pc and g.ndim == 2):
            s = s[0]
        s_list.append(s)
        flats.append(q.quantize(g, s, bits).astype(jnp.int32).reshape(-1))
    summed = jax.lax.psum(jnp.concatenate(flats), axis)  # ONE psum
    outs, pos = [], 0
    for g, s in zip(tensors, s_list):
        n = int(np.prod(g.shape)) if g.shape else 1
        gi = summed[pos : pos + n].reshape(g.shape)
        pos += n
        outs.append(q.dequantize(gi, s) / n_dev)
    return outs


def compressed_sparse_allgather(
    ids: jax.Array,  # [K] local touched row ids
    vals: jax.Array,  # [K, D] local row gradients
    bits: int,
    axis: str,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sparse embedding-gradient exchange: (ids, INT-packed rows) all-gather.

    The reference all-reduces a sparse COO tensor of INT8-quantized values
    (quantize_emb_grad + all_reduce, sgd_…_parallel_comm.py:850-890), which
    torch implements internally as an index/value gather. Here that is
    explicit: all-gather ids and integer values over ICI; every replica
    applies all N·K rows. At bits<=4 the values travel NIBBLE-PACKED (two
    per byte) — half the wire bytes of the reference's INT8 floor (its
    Table 4 note blames the lack of native low-precision sparse allreduce;
    packing is that native path). Returns (all_ids [N*K], all_vals int8
    [N*K, D] already unpacked, scale).
    """
    s_local = q.symmetric_quantization_params(bits, jnp.min(vals), jnp.max(vals))
    s = _mean_scale(s_local, axis)
    v_int = q.quantize(vals, s, bits)  # int8 container
    all_ids = jax.lax.all_gather(ids, axis, tiled=True)  # [N*K]
    if bits <= 4 and vals.shape[-1] % 2 == 0:
        D = vals.shape[-1]
        u = (v_int.astype(jnp.int32) + 8).astype(jnp.uint8)  # [-8,7] -> [0,15]
        packed = u[:, : D // 2] | (u[:, D // 2 :] << 4)  # [K, D/2] uint8
        all_packed = jax.lax.all_gather(packed, axis, tiled=True)
        v = all_packed.astype(jnp.int32)
        lo = (v & 0xF) - 8
        hi = ((v >> 4) & 0xF) - 8
        all_vals = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
    else:
        all_vals = jax.lax.all_gather(v_int, axis, tiled=True)  # [N*K, D]
    return all_ids, all_vals, s


# ---------------------------------------------------------------------------
# The DP train step
# ---------------------------------------------------------------------------


def make_dp_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    axis: str = "mp",
    has_mask: bool = False,
    steps_per_dispatch: int = 1,
    use_scan: bool = True,
    pin_state_template: Optional[DPState] = None,
):
    """Build the jitted DP train step with compressed gradient exchange.

    `pin_state_template`: a DPState whose structure pins the dense emb
    tables to row-major layouts on inputs AND outputs (pass a state built
    by `pin_dp_state_layout`) — removes XLA's per-dispatch layout
    conversion copies, which OOM/66x the Terabyte-scale model (see
    train_step.pin_params_layout).

    The returned fn takes (DPState replicated, Batch with batch-dim sharded
    over `axis`) and returns (new DPState, mean loss). Mirrors the per-
    iteration sequence of comm_grad.py:1874-1991: slice batch -> forward ->
    backward -> clear/quantize/communicate grads -> manual SGD -> lr step ->
    periodic weight sync.

    steps_per_dispatch > 1 runs k sequential steps inside ONE dispatch
    (takes a LIST of k batches or one stacked leading-[k] Batch) —
    numerically identical to k single dispatches; amortizes host dispatch
    overhead like train_step.make_multi_train_step. With `use_scan` (the
    default) the k steps ride `lax.scan` inside the shard_map, so compile
    time and program size are O(1) in k; use_scan=False restores the
    k-times-unrolled body (list input only).
    """
    qc = config.quant
    learned_vw = config.weighted_pooling == "learned"
    grad_bits = tc.grad_quant_bits
    # QR/MD compositional tables are small by construction, so their
    # gradients are DENSE and tiny: they ride the same compressed psum as
    # the MLP weights (the reference's comm path has no QR/MD — its sparse
    # loop expects .embedding_bag, sgd_…_parallel_comm.py:850-890 — so this
    # is a strict capability extension, not a parity deviation).
    trick_ks = frozenset(
        k for k in range(config.num_tables) if config.table_kind(k) != "dense"
    )
    # ranking_range is a policy over the SPARSE embedding-gradient
    # exchanges; QR/MD tables have dense grads and ride the psum channel,
    # so the policy simply skips them (dense ordinal <-> table id maps).
    dense_ks = [
        k for k in range(config.num_tables) if k not in trick_ks
    ]
    dense_ord = {k: i for i, k in enumerate(dense_ks)}
    if tc.ranking_range and not dense_ks:
        raise ValueError(
            "ranking_range is a policy over the SPARSE embedding-gradient "
            "exchange; this model has no dense tables (all QR/MD) — "
            "nothing for the policy to govern"
        )

    def device_step(state: DPState, batch: dlrm.Batch):
        params, qstate = state.params, state.qstate

        if qc.enabled:
            qstate = dlrm.update_emb_scales(config, params, qstate)

        mlp_params = {k: v for k, v in params.items() if k != "emb"}
        if trick_ks:
            # Differentiate through the trick lookups directly: their params
            # join the dense-gradient side.
            mlp_params["emb_trick"] = {
                str(k): params["emb"][k] for k in sorted(trick_ks)
            }

        # Raw pooled lookups with tables held constant: the autodiff cut
        # point that keeps embedding gradients sparse.
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
                # Recompute trick-table pooled outputs from the
                # differentiable params (learned pooling weights ride the
                # recompute too; "fixed" ones are stop-gradded buffers).
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
                # LSQ grad scales see the GLOBAL batch numel so the pmean'd
                # step grads equal the single-chip ones exactly
                # (quant.fake_quant_lsq docstring)
                lsq_numel_scale=float(mesh.shape[axis]),
            )
            return dlrm.training_loss(config, logits, batch.labels), new_qs

        (loss, new_qs), (mlp_grads, g_pooled) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(mlp_params, raw_pooled)

        n_dev = jax.lax.psum(1, axis)
        mean_loss = jax.lax.pmean(loss, axis)

        # 1-based iteration count for the LR policy.
        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        # ---- MLP gradients: INT8 compressed psum (+ error feedback) ----
        # All 2*L tensors ride ONE batched scale pmean + ONE int32 psum
        # (compressed_psum_batched — bit-identical to per-tensor
        # collectives, 2 launches instead of 2 per tensor; round 4).
        tensor_keys = [
            (part, li, key)
            for part in ("bot", "top")
            for li in range(len(params[part]))
            for key in ("w", "b")
        ]
        gs = []
        for part, li, key in tensor_keys:
            g = mlp_grads[part][li][key]
            if tc.error_compensation:
                g = g + state.ec[part][li][key]
            gs.append(g)
        if grad_bits >= 32:
            means = [jax.lax.pmean(g, axis) for g in gs]
        else:
            means = compressed_psum_batched(
                gs, grad_bits, axis,
                [key == "w" for _, _, key in tensor_keys],
            )
        new_mlp = {p: [{} for _ in params[p]] for p in ("bot", "top")}
        new_ec = {p: [{} for _ in params[p]] for p in ("bot", "top")}
        for i, (part, li, key) in enumerate(tensor_keys):
            g, g_mean = gs[i], means[i]
            if grad_bits < 32 and tc.error_compensation:
                # Residual = what LOCAL-scale quantization lost
                # (sgd_quantized_gradients.py:596-598).
                s_loc = q.symmetric_quantization_params(
                    grad_bits,
                    jnp.min(g, axis=1) if key == "w" and g.ndim == 2 else jnp.min(g),
                    jnp.max(g, axis=1) if key == "w" and g.ndim == 2 else jnp.max(g),
                )
                g_deq = q.dequantize(q.quantize(g, s_loc, grad_bits), s_loc)
                new_ec[part][li][key] = g - g_deq
            else:
                new_ec[part][li][key] = jnp.zeros_like(g)
            # Manual SGD (weight_update_parallel_comm,
            # sgd_…_parallel_comm.py:601-685).
            new_mlp[part][li][key] = params[part][li][key] - lr * g_mean

        # ---- Embedding gradients: sparse compressed exchange ----
        # Coalesce duplicate rows BEFORE quantizing, matching the
        # reference's `.coalesce()` -> scale -> quantize order
        # (sgd_…_parallel_comm.py:850-866): sum-then-quantize is the
        # correct numerics. ALL dense tables coalesce in ONE batched pass
        # (coalesce_sparse_grads_batched) and their scales/quantize/pack/
        # all_gather stages are batched too — the round-4 breakdown found
        # the 26 per-table sorts+gathers were the bulk of the dp engine's
        # 2.2x overhead over the plain step (per-table ops are latency-
        # bound on TPU; see PARITY.md "dp engine overhead"). Padding rows
        # are value-0, which never moves a SYMMETRIC scale, so the uniform
        # K = B*P slot count is numerics-identical to the old per-table
        # min(B*P, rows) bound.
        pact = qc.enabled and qc.quantize_emb and qc.quant_scheme == "pact"
        Td = len(dense_ks)
        uniq_ids = uniq_vals = None
        vw_uniq = None
        if Td:
            dense_arr = jnp.asarray(dense_ks, jnp.int32)
            B_, P_ = batch.indices.shape[1], batch.indices.shape[2]
            KBP = B_ * P_
            ids_st = batch.indices[dense_arr].reshape(Td, KBP)
            gp_st = jnp.stack([g_pooled[k] for k in dense_ks])  # [Td,B,D]
            w_st = None  # effective per-occurrence weight [Td,B,P]
            if batch.mask is not None:
                w_st = batch.mask[dense_arr].astype(gp_st.dtype)
            if config.weighted_pooling is not None:
                # d pooled / d row = v_W[row] (per_sample_weights,
                # dlrm_s_pytorch.py:417-418); compose into the bag mask.
                vw_rows = jnp.stack(
                    [
                        jnp.take(params["v_W"][k], batch.indices[k], axis=0)
                        for k in dense_ks
                    ]
                ).astype(gp_st.dtype)
                w_st = vw_rows if w_st is None else w_st * vw_rows
            vals_st = jnp.broadcast_to(
                gp_st[:, :, None, :], (Td, B_, P_, gp_st.shape[-1])
            )
            if w_st is not None:
                vals_st = vals_st * w_st[..., None]
            vals_st = vals_st.reshape(Td, KBP, -1)
            num_rows_arr = jnp.asarray(
                [params["emb"][k].shape[0] for k in dense_ks], ids_st.dtype
            )
            uniq_ids, uniq_vals = coalesce_sparse_grads_batched(
                ids_st, vals_st, num_rows_arr, KBP
            )
            if learned_vw:
                # d pooled[b] / d v_W[idx[b,p]] = mask * E[idx[b,p]], so the
                # per-occurrence scalar gradient is g_pooled[b] . E[idx] —
                # the same sparse (ids, values) shape as the row grads, with
                # D=1. E must be the rows the forward actually used (PACT
                # fake-quants the table before the gather, lookup_all).
                tbls = []
                for k in dense_ks:
                    tbl = params["emb"][k]
                    if pact:
                        tbl = q.fake_quant_pact(tbl, qc.embedding_bit)
                    tbls.append(jnp.take(tbl, batch.indices[k], axis=0))
                rows_e = jnp.stack(tbls)  # [Td,B,P,D]
                contrib = jnp.einsum(
                    "tbd,tbpd->tbp", gp_st.astype(jnp.float32), rows_e
                )
                if batch.mask is not None:
                    contrib = contrib * batch.mask[dense_arr]
                vw_uniq = coalesce_sparse_grads_batched(
                    ids_st, contrib.reshape(Td, KBP, 1), num_rows_arr, KBP
                )

        def gather_tables(x):
            """all_gather with per-table shard concat: [Td, K, ...] ->
            [Td, N*K, ...] (shard-major order — identical layout to the
            old per-table tiled all_gathers)."""
            g = jax.lax.all_gather(x, axis)  # [N, Td, K, ...]
            return jnp.moveaxis(g, 0, 1).reshape(
                (x.shape[0], -1) + x.shape[2:]
            )

        if tc.ranking_range:
            # Mixed-bit policy (grad_precision_and_scale): all-reduce per-
            # table ranges, normalize by weight scale, sample assignment.
            # Indexed by DENSE ordinal (QR/MD tables are not in the sparse
            # exchange this policy governs).
            ranges_local = jnp.max(jnp.abs(uniq_vals), axis=(1, 2))
            ranges = jax.lax.pmax(ranges_local, axis)
            w_scales = (
                qstate.emb_scales[jnp.asarray(dense_ks)]
                if qc.enabled
                else jnp.ones_like(ranges)
            )
            modes = ranking_range.assign_bit_widths(
                ranges, w_scales, qstate.step,
                tc.ranking_frac_hi, tc.ranking_frac_int8,
            )

        # Batched exchange for ALL dense tables: one scale pmean + at most
        # two all_gathers total (vs 2 gathers + a pmean PER TABLE before
        # round 4). Shard-major concat order per table is identical to the
        # old per-table tiled all_gathers.
        all_ids_st = deltas_st = None
        if Td and not tc.ranking_range:
            if grad_bits >= 32:
                all_ids_st = gather_tables(uniq_ids)
                deltas_st = gather_tables(uniq_vals)
            else:
                s_loc = q.symmetric_quantization_params(
                    grad_bits,
                    jnp.min(uniq_vals, axis=(1, 2)),
                    jnp.max(uniq_vals, axis=(1, 2)),
                )
                s_vec = _mean_scale(s_loc, axis)  # [Td]
                v_int = q.quantize(
                    uniq_vals, s_vec[:, None, None], grad_bits
                )
                all_ids_st = gather_tables(uniq_ids)
                D_ = uniq_vals.shape[-1]
                if grad_bits <= 4 and D_ % 2 == 0:
                    # nibble-pack (two int4 per byte) before the gather —
                    # see compressed_sparse_allgather for the wire format
                    u = (v_int.astype(jnp.int32) + 8).astype(jnp.uint8)
                    packed = u[..., : D_ // 2] | (u[..., D_ // 2 :] << 4)
                    ap = gather_tables(packed).astype(jnp.int32)
                    lo = (ap & 0xF) - 8
                    hi = ((ap >> 4) & 0xF) - 8
                    all_int = jnp.concatenate([lo, hi], axis=-1)
                else:
                    all_int = gather_tables(v_int)
                deltas_st = q.dequantize(all_int, s_vec[:, None, None])

        new_emb = []
        for k, table in enumerate(params["emb"]):
            if k in trick_ks:
                # QR/MD: dense tiny grads -> same compressed psum channel
                # as the MLP weights, then manual SGD.
                g_trick = mlp_grads["emb_trick"][str(k)]
                if grad_bits >= 32:
                    g_mean_t = jax.tree_util.tree_map(
                        lambda g: jax.lax.pmean(g, axis), g_trick
                    )
                else:
                    g_mean_t = jax.tree_util.tree_map(
                        lambda g: compressed_psum_dense(
                            g, grad_bits, axis, per_channel=(g.ndim == 2)
                        ),
                        g_trick,
                    )
                new_emb.append(
                    jax.tree_util.tree_map(
                        lambda p, g: p - lr * g, table, g_mean_t
                    )
                )
                continue
            d = dense_ord[k]
            if tc.ranking_range:
                s = ranking_range.grad_scale_int16(ranges[d])
                enc = ranking_range.encode_two_channel(
                    uniq_vals[d], s, modes[d]
                )
                all_ids = jax.lax.all_gather(uniq_ids[d], axis, tiled=True)
                all_enc = jax.lax.all_gather(enc, axis, tiled=True)
                delta = ranking_range.decode_two_channel(all_enc, s, modes[d])
                # skipped tables: route ids out of range -> dropped scatter
                all_ids = jnp.where(modes[d] == ranking_range.SKIP,
                                    table.shape[0], all_ids)
            else:
                all_ids = all_ids_st[d]
                delta = deltas_st[d]
            # Mean over replicas; scatter-add applies every touched row.
            # Small tables take the MXU one-hot dense grad instead of the
            # latency-bound serial scatter (ops/pallas/onehot_update.py);
            # mid tables stream (ops/pallas/stream_update.py — the gathered
            # id list is a concat of per-shard sorted segments, so it
            # re-sorts with the payload sort first).
            if 0 < table.shape[0] <= tc.onehot_update_max_rows:
                dense = dense_grad_auto(
                    all_ids, delta.astype(jnp.float32), table.shape[0]
                )
                new_emb.append(
                    table + (-(lr / n_dev) * dense).astype(table.dtype)
                )
            elif 0 < table.shape[0] <= tc.stream_update_max_rows:
                sids, svals = sort_sparse_grad(
                    all_ids, delta.astype(jnp.float32)
                )
                new_emb.append(
                    stream_update_auto(
                        table, sids, -(lr / n_dev) * svals, presorted=True
                    )
                )
            else:
                new_emb.append(
                    table.at[all_ids].add(
                        # cast AFTER scaling: lr is f32, so scaling a
                        # bf16-cast delta promotes back to f32 and XLA
                        # wraps the scatter in a FULL-TABLE f32
                        # convert/deconvert (4.8 GB temp at Terabyte
                        # scale — OOM'd the rehearsal)
                        (-(lr / n_dev) * delta).astype(table.dtype),
                        mode="drop",
                    )
                )

        # Remaining non-MLP dense params (LSQ step sizes, fixed pooling
        # weights) ride the uncompressed pmean path; "fixed" pooling
        # weights have zero grads and pass through unchanged.
        new_params = {**new_mlp, "emb": new_emb}
        for key in params:
            if key in ("bot", "top", "emb"):
                continue
            if key == "v_W" and learned_vw:
                continue  # handled below: sparse exchange, like the tables
            new_params[key] = jax.tree_util.tree_map(
                lambda p, g: p - lr * jax.lax.pmean(g, axis),
                params[key],
                mlp_grads[key],
            )

        if learned_vw:
            # Learned pooling weights: dense tables' v_W grads are sparse
            # per-row scalars — exchanged like the embedding rows (fp32:
            # they are 1/D of the row-grad bytes, compression would cost
            # more precision than wire time saved), in the same batched
            # two-all_gather form; QR/MD tables' v_W grads came through
            # autodiff (the trick recompute) and ride pmean.
            # vw_uniq is None when EVERY table is QR/MD (Td == 0): all
            # v_W grads then come through the trick recompute below
            if vw_uniq is not None:
                vw_ids_st = gather_tables(vw_uniq[0])
                vw_vals_st = gather_tables(vw_uniq[1])
            new_vw = []
            for k in range(config.num_tables):
                if k in trick_ks:
                    g = jax.lax.pmean(mlp_grads["v_W"][k], axis)
                    new_vw.append(params["v_W"][k] - lr * g)
                    continue
                d = dense_ord[k]
                new_vw.append(
                    params["v_W"][k]
                    .at[vw_ids_st[d]]
                    .add(-(lr / n_dev) * vw_vals_st[d][:, 0], mode="drop")
                )
            new_params["v_W"] = new_vw

        new_qs = new_qs._replace(step=qstate.step + 1)
        return DPState(new_params, new_qs, new_ec), mean_loss

    batch_specs = dlrm.Batch(
        dense=P(axis),  # [B, nd] sharded on batch
        indices=P(None, axis),  # [T, B, P]
        labels=P(axis),
        mask=P(None, axis) if has_mask else None,
    )

    def _jit_state_fn(fn):
        """jit with state donation; when pinning, constrain the dense emb
        leaves' layouts on input and output so they stay row-major across
        dispatches (no boundary conversion copies)."""
        if pin_state_template is None:
            return jax.jit(fn, donate_argnums=(0,))
        spec = _dp_state_layout_spec(pin_state_template, mesh)
        return jax.jit(
            fn, donate_argnums=(0,),
            in_shardings=(spec, None), out_shardings=(spec, None),
        )

    if steps_per_dispatch > 1:
        if use_scan:
            # lax.scan over the per-step body INSIDE the one shard_map:
            # the collectives sit in the scan body (all replicas run the
            # loop in lockstep, so per-iteration collective op-ids match).
            # Program size is O(1) in k — the k=16 dp megastep compiles in
            # seconds where the unrolled form costs minutes (round-3
            # compile-cache discovery); numerics identical to the unrolled
            # form (equivalence-tested). Takes one stacked Batch with a
            # leading [k] axis (or a list, stacked host-side by the
            # wrapper — one upload per field instead of one per batch).
            stacked_specs = dlrm.Batch(
                dense=P(None, axis),  # [k, B, nd]
                indices=P(None, None, axis),  # [k, T, B, P]
                labels=P(None, axis),
                mask=P(None, None, axis) if has_mask else None,
            )

            def device_scan(state: DPState, stacked: dlrm.Batch):
                state, losses = jax.lax.scan(device_step, state, stacked)
                return state, losses[-1]

            step = _jit_state_fn(
                shard_map(
                    device_scan,
                    mesh=mesh,
                    in_specs=(P(), stacked_specs),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
            )

            def run(state: DPState, batches):
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    stack_batches,
                )

                if not isinstance(batches, dlrm.Batch):
                    batches = stack_batches(list(batches))
                return step(state, batches)

            run.lower = step.lower  # AOT inspection (plot-compute-graph)
            return run

        def device_multi(state: DPState, batches):
            loss = None
            for b in batches:
                state, loss = device_step(state, b)
            return state, loss

        step = shard_map(
            device_multi,
            mesh=mesh,
            in_specs=(P(), [batch_specs] * steps_per_dispatch),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return _jit_state_fn(step)

    step = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return _jit_state_fn(step)


def make_dp_nosync_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    mesh: Mesh,
    axis: str = "mp",
    has_mask: bool = False,
):
    """Local-SGD / no-sync DP ablation (`dlrm_s_pytorch_dp_only.py`:
    1902-1905): every device holds a full replica and steps on its batch
    shard with NO gradient synchronization at all — replicas drift freely
    (periodic `make_weight_sync` re-averages them if desired). Returns
    (state with per-device params, mean loss). The state's params live
    sharded-as-replicated (check disabled); use weight_sync before eval.
    """
    def device_step(state: DPState, batch: dlrm.Batch):
        params, qstate = state.params, state.qstate
        if config.quant.enabled:
            qstate = dlrm.update_emb_scales(config, params, qstate)

        def loss_fn(p):
            logits, new_qs = dlrm.forward(config, p, batch, qstate, train=True)
            return dlrm.training_loss(config, logits, batch.labels), new_qs

        (loss, new_qs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g).astype(p.dtype), params, grads
        )
        new_qs = new_qs._replace(step=qstate.step + 1)
        return DPState(new_params, new_qs, state.ec), jax.lax.pmean(loss, axis)

    batch_specs = dlrm.Batch(
        dense=P(axis),
        indices=P(None, axis),
        labels=P(axis),
        mask=P(None, axis) if has_mask else None,
    )
    step = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_dp_eval_step(
    config: DLRMConfig,
    mesh: Mesh,
    axis: str = "mp",
    has_mask: bool = False,
    pin_state_template: Optional[DPState] = None,
):
    """Rank-sharded evaluation: each device scores its batch shard and the
    probabilities are all-gathered so every host sees the full result
    (`inference_distributed`, dlrm_s_pytorch_comm_grad.py:1170-1305; logits
    all_gather dlrm_s_pytorch.py:809)."""

    def device_eval(state: DPState, batch: dlrm.Batch) -> jax.Array:
        logits, _ = dlrm.forward(
            config, state.params, batch, state.qstate, train=False
        )
        p = jax.nn.sigmoid(logits)
        if 0.0 < config.loss_threshold < 1.0:
            p = jnp.clip(p, config.loss_threshold, 1.0 - config.loss_threshold)
        return jax.lax.all_gather(p, axis, tiled=True)

    batch_specs = dlrm.Batch(
        dense=P(axis), indices=P(None, axis), labels=P(axis),
        mask=P(None, axis) if has_mask else None,
    )
    fn = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=P(),
        check_vma=False,
    )
    if pin_state_template is not None:
        # read the pinned tables in place (no per-eval conversion copies)
        spec = _dp_state_layout_spec(pin_state_template, mesh)
        return jax.jit(fn, in_shardings=(spec, None))
    return jax.jit(fn)


def make_weight_sync(
    mesh: Mesh,
    axis: str = "mp",
    pin_state_template: Optional[DPState] = None,
):
    """Periodic full-weight all-reduce mean (`weight_syncc`,
    dlrm_s_pytorch_comm_grad.py:1977-1991): bounds replica drift. Called by
    the training loop every `weight_sync_period` steps — a separate compiled
    program because collectives cannot sit inside a `lax.cond` branch (the
    branch's collective op-ids collide with the main body's). In this
    framework replicas compute bit-identical updates, so this is a cheap
    safeguard rather than a correctness requirement (unlike the reference,
    whose per-rank sparse reductions reorder nondeterministically)."""

    def sync(state: DPState) -> DPState:
        synced = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), state.params
        )
        return state._replace(params=synced)

    fn = shard_map(sync, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False)
    if pin_state_template is not None:
        # keep the pinned table layouts through the sync so the next train
        # dispatch sees the layouts its executable expects
        spec = _dp_state_layout_spec(pin_state_template, mesh)
        return jax.jit(
            fn, donate_argnums=(0,), in_shardings=(spec,), out_shardings=spec
        )
    return jax.jit(fn, donate_argnums=(0,))
