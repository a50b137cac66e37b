"""DLRM/DQRM as a pure functional JAX model.

One model definition replaces the 20 near-identical `DLRM_Net` clones in the
reference drivers (dlrm_s_pytorch.py:198-733 and QAT variant
dlrm_s_pytorch_comm_grad.py:278-969). Parameters and quantization state are
explicit pytrees; `forward` is a pure function safe under `jit`, `grad`,
`vmap`, and `shard_map`.

Structure (reference `DLRM_Net.forward`, sequential mode):
    bottom MLP(dense) -> per-table pooled embedding lookups
    -> pairwise dot interaction -> top MLP -> click logit.

QAT mode (reference QAT forward dlrm_s_pytorch_comm_grad.py:809-895):
    - embedding tables: fake-quantize the *pooled output* with a per-table
      scale held in QuantState and refreshed periodically
      (QuantEmbeddingBagTwo, quant_modules_not_quantize_grad.py:317-397);
    - MLP weights+biases: symmetric fake-quant recomputed from current
      min/max each forward (QuantLinear, quant_modules.py:94-188);
    - optional activation quantization: an input QuantAct produces
      (x_q, scale); QuantLinear layers chain integer activations with
      `ste_round` and pass scales forward; the interaction output goes
      through a second QuantAct (comm_grad.py:863-879).

We emit *logits*; sigmoid lives in `predict`/`bce_loss` (numerically stable
equivalent of the reference's in-model Sigmoid + BCELoss).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import tricks
from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import pooled_lookup
from deep_quantized_recommendation_model_dqrm_tpu.ops.interaction import (
    cat_interaction,
    dot_interaction,
    quantized_dot_interaction,
)

Params = Dict[str, Any]


class Batch(NamedTuple):
    """One minibatch in the layout of collate_wrapper_criteo_offset
    (dlrm_data_pytorch.py:328-345), with offsets replaced by a fixed pooling
    axis + mask (static shapes for XLA)."""

    dense: jax.Array  # [B, num_dense] float32, already log1p-transformed
    indices: jax.Array  # [T, B, P] int32
    labels: jax.Array  # [B] float32 in {0, 1}
    mask: Optional[jax.Array] = None  # [T, B, P] float, None => all ones


class QuantState(NamedTuple):
    """Explicit QAT state the reference keeps in module buffers.

    - emb_scales: per-table pooled-output scale (`eb_scaling_factor`,
      quant_modules.py:235-245), refreshed every `scale_update_period` steps.
    - act_min/act_max: running ranges for the two QuantAct instances
      [0] = quant_input, [1] = quant_feature_outputs (comm_grad.py:522-523).
    - step: global iteration counter driving the periodic update
      (`now_iteration`/`iteration_bound`, quant_modules.py:279-291).
    """

    emb_scales: jax.Array  # [T] float32
    act_min: jax.Array  # [2] float32
    act_max: jax.Array  # [2] float32
    step: jax.Array  # int32 scalar
    # fix/unfix flag (freeze_model/unfreeze_model, quant_modules.py:
    # 1071-1112): nonzero freezes activation ranges even in train mode.
    act_fixed: jax.Array


def init_quant_state(config: DLRMConfig) -> QuantState:
    T = config.num_tables
    return QuantState(
        emb_scales=jnp.ones((T,), jnp.float32),
        act_min=jnp.zeros((2,), jnp.float32),
        act_max=jnp.zeros((2,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        act_fixed=jnp.zeros((), jnp.int32),
    )


def freeze_ranges(qstate: QuantState) -> QuantState:
    """freeze_model (quant_modules.py:1071-1090): fix activation ranges."""
    return qstate._replace(act_fixed=jnp.ones((), jnp.int32))


def unfreeze_ranges(qstate: QuantState) -> QuantState:
    """unfreeze_model (quant_modules.py:1093-1112)."""
    return qstate._replace(act_fixed=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Initialization — matches reference numerics so loss curves are comparable.
# ---------------------------------------------------------------------------


def init_params(
    config: DLRMConfig, seed: int = 0, dtype=jnp.float32, host_emb: bool = False
) -> Params:
    """Initialize the DLRM parameter pytree.

    MLP: W ~ N(0, sqrt(2/(fan_in+fan_out))), b ~ N(0, sqrt(1/fan_out))
    (create_mlp, dlrm_s_pytorch.py:199-238). Embeddings: U(-1/sqrt(n),
    1/sqrt(n)) (create_emb, dlrm_s_pytorch.py:269-276). Uses numpy RNG host-
    side (tables can be GBs; generated per-table then device_put by caller).

    `host_emb=True` keeps the DENSE embedding tables as HOST numpy arrays
    (bit-identical values; bf16 via ml_dtypes round-to-nearest-even, the
    same rounding jnp.asarray applies) so Terabyte-scale callers can
    stream them into a device mega-table without ever holding a full
    device copy (hybrid.pack_tables_pinned_streaming). QR/MD dict entries
    and MLPs stay device-resident (small).
    """
    rng = np.random.RandomState(seed)

    def mlp(ln):
        layers = []
        for n, m in zip(ln[:-1], ln[1:]):
            w = rng.normal(0.0, np.sqrt(2.0 / (m + n)), size=(m, n)).astype(np.float32)
            b = rng.normal(0.0, np.sqrt(1.0 / m), size=(m,)).astype(np.float32)
            layers.append({"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)})
        return layers

    emb = []
    t_dtype = jnp.bfloat16 if config.table_dtype == "bfloat16" else dtype
    md_dims = config.md_dims()
    for k, n in enumerate(config.table_sizes):
        bound = np.sqrt(1.0 / n)
        kind = config.table_kind(k)
        if kind == "qr":
            # QR compositional tables (QREmbeddingBag init,
            # tricks/qr_embedding_bag.py:118-137): two U(-1/sqrt(n), ..)
            # tables; "concat" splits the dim. Arrays only — static metadata
            # (collisions/operation) lives in the config so the entry is a
            # clean pytree.
            c = config.qr_collisions
            num_q = (n + c - 1) // c
            d_q = d_r = config.embedding_dim
            if config.qr_operation == "concat":
                d_q = config.embedding_dim // 2
                d_r = config.embedding_dim - d_q
            emb.append(
                {
                    "q": jnp.asarray(
                        rng.uniform(-bound, bound, size=(num_q, d_q)).astype(np.float32),
                        t_dtype,
                    ),
                    "r": jnp.asarray(
                        rng.uniform(-bound, bound, size=(c, d_r)).astype(np.float32),
                        t_dtype,
                    ),
                }
            )
        elif kind == "md":
            # Mixed-dim table + projection (PrEmbeddingBag,
            # tricks/md_embedding_bag.py:20-60).
            d_k = md_dims[k]
            entry = {
                "table": jnp.asarray(
                    rng.uniform(-bound, bound, size=(n, d_k)).astype(np.float32),
                    t_dtype,
                )
            }
            if d_k < config.embedding_dim:
                lim = np.sqrt(6.0 / (d_k + config.embedding_dim))
                entry["proj"] = jnp.asarray(
                    rng.uniform(
                        -lim, lim, size=(config.embedding_dim, d_k)
                    ).astype(np.float32)
                )
            emb.append(entry)
        else:
            w = rng.uniform(-bound, bound, size=(n, config.embedding_dim)).astype(np.float32)
            if host_emb:
                import ml_dtypes

                npdt = (
                    ml_dtypes.bfloat16
                    if config.table_dtype == "bfloat16"
                    else np.float32
                )
                emb.append(w.astype(npdt))
            else:
                emb.append(jnp.asarray(w, t_dtype))

    params: Params = {"bot": mlp(config.mlp_bot), "top": mlp(config.mlp_top), "emb": emb}
    if config.weighted_pooling is not None:
        # v_W_l: per-row pooling weights initialized to ones
        # (dlrm_s_pytorch.py:276-281); "fixed" freezes them via stop_gradient
        # in lookup_all, "learned" trains them.
        params["v_W"] = [jnp.ones((n,), jnp.float32) for n in config.table_sizes]
    if config.quant.enabled and config.quant.quant_scheme == "lsq":
        # LSQ trainable step sizes, one per table, initialized from the
        # table stats rule s0 = 2*mean|w|/sqrt(Qp) (quantizer/lsq.py:42-45).
        qp = 2 ** (config.quant.embedding_bit - 1) - 1
        params["lsq_emb"] = [
            jnp.asarray(2.0 * jnp.mean(jnp.abs(t)) / np.sqrt(qp), jnp.float32)
            if not isinstance(t, dict)
            else jnp.ones((), jnp.float32)  # QR/MD: unused placeholder
            for t in emb
        ]
        if config.quant.quantize_mlp:
            # MLP learned steps (QuantLinearLSQ, quant_learned_step_size_
            # quan.py:32-57): per-out-channel for weights, per-tensor for
            # bias, both from the init_from table-stats rule. The reference
            # ctor hardcodes bit=4 there; we use weight_bit (set it to 4
            # for exact parity) — documented in PARITY.md.
            qpw = 2 ** (config.quant.weight_bit - 1) - 1
            params["lsq_mlp"] = {
                part: [
                    {
                        "w": 2.0
                        * jnp.mean(jnp.abs(l["w"]), axis=1)
                        / np.sqrt(qpw),
                        "b": jnp.asarray(
                            2.0 * jnp.mean(jnp.abs(l["b"])) / np.sqrt(qpw),
                            jnp.float32,
                        ),
                    }
                    for l in params[part]
                ]
                for part in ("bot", "top")
            }
    return params


# ---------------------------------------------------------------------------
# Quantization-state updates
# ---------------------------------------------------------------------------


def compute_emb_scales(config: DLRMConfig, params: Params) -> jax.Array:
    """Per-table whole-table symmetric scales (the periodic min/max scan,
    quant_utils.py:141-194). One fused reduction per table. QR/MD tables
    stay full-precision (reference create_emb dispatch precedes the
    quantization branch) and get placeholder scales."""
    # NOTE: reduce in the table's own dtype and convert only the SCALAR
    # extrema — `t.astype(f32)` here would materialize a full fp32 copy of
    # every table inside the lax.cond branch (12.6 GB of program memory for
    # bf16 Terabyte tables; caused a real HBM OOM). min/max over bf16 is
    # exact, so the scale is unchanged.
    scales = [
        q.table_scale(config.quant.embedding_bit, t)
        if not isinstance(t, dict)
        else jnp.ones((), jnp.float32)
        for t in params["emb"]
    ]
    return jnp.stack(scales)


def update_emb_scales(
    config: DLRMConfig, params: Params, qstate: QuantState
) -> QuantState:
    """Refresh emb scales when step % period == 0 (paper §3.2 periodic update;
    quant_modules_not_quantize_grad.py:331-344). The min/max scan only
    executes on refresh steps thanks to `lax.cond`."""
    if not config.quant.quantize_emb:
        return qstate  # MLP-only QAT: pooled outputs stay full-precision
    period = max(config.quant.scale_update_period, 1)
    do_update = (qstate.step % period) == 0
    new_scales = jax.lax.cond(
        do_update,
        lambda: compute_emb_scales(config, params),
        lambda: qstate.emb_scales,
    )
    return qstate._replace(emb_scales=new_scales)


def _quant_act(
    x: jax.Array,
    bits: int,
    x_min: jax.Array,
    x_max: jax.Array,
    momentum: float,
    train: bool,
    percentile: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """QuantAct forward (quant_modules.py:538-637, symmetric mode).

    Returns (x_fq, scale, new_min, new_max). Running range: initialize on
    first batch (min==max==0 sentinel), then momentum-EMA or running extremum
    (momentum == -1). `percentile` > 0 clips the observed range
    (get_percentile_min_max, quant_modules.py:567-577).
    """
    if train:
        if percentile > 0.0:
            lo, hi = q.get_percentile_min_max(x, 100.0 - percentile, percentile)
            cur_min = jax.lax.stop_gradient(lo)
            cur_max = jax.lax.stop_gradient(hi)
        else:
            cur_min = jax.lax.stop_gradient(jnp.min(x))
            cur_max = jax.lax.stop_gradient(jnp.max(x))
        uninit = x_min == x_max
        if momentum == -1.0:
            upd_min = jnp.minimum(x_min, cur_min)
            upd_max = jnp.maximum(x_max, cur_max)
        else:
            upd_min = x_min * momentum + cur_min * (1.0 - momentum)
            upd_max = x_max * momentum + cur_max * (1.0 - momentum)
        new_min = jnp.where(uninit, x_min + cur_min, upd_min)
        new_max = jnp.where(uninit, x_max + cur_max, upd_max)
    else:
        new_min, new_max = x_min, x_max
    scale = q.symmetric_quantization_params(bits, new_min, new_max)
    x_fq = q.fake_quant(x, scale, bits)
    return x_fq, scale, new_min, new_max


# ---------------------------------------------------------------------------
# MLP application
# ---------------------------------------------------------------------------


def _mm(x: jax.Array, w: jax.Array, cdtype) -> jax.Array:
    """x @ w.T in the configured compute dtype.

    cdtype == bfloat16 casts both operands to bf16 and accumulates in fp32
    (`preferred_element_type`), mapping the matmul onto the MXU's native
    bf16 path (2x fp32 rate). The casts are linear, so autodiff produces
    bf16 backward matmuls too; master weights stay fp32."""
    if cdtype == jnp.bfloat16:
        return jnp.matmul(
            x.astype(jnp.bfloat16),
            w.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return x @ w.T


def _apply_mlp_fp(
    layers, x: jax.Array, last_linear: bool, cdtype=jnp.float32
) -> jax.Array:
    """FP32 MLP: Linear+ReLU stacks; the final top layer emits raw logits
    (the reference's Sigmoid there moves into predict/loss)."""
    n = len(layers)
    for i, layer in enumerate(layers):
        x = _mm(x, layer["w"], cdtype) + layer["b"]
        if not (last_linear and i == n - 1):
            x = jax.nn.relu(x)
    return x


def _quant_linear_weights(layer, wbits: int, bbits: int, per_channel: bool):
    """Per-forward weight/bias scale + fake-quant (QuantLinear,
    quant_modules.py:107-135)."""
    w, b = layer["w"], layer["b"]
    if per_channel:
        w_min = jnp.min(w, axis=1)
        w_max = jnp.max(w, axis=1)
    else:
        w_min = jnp.min(w)
        w_max = jnp.max(w)
    s_w = q.symmetric_quantization_params(wbits, w_min, w_max)
    return s_w, q.fake_quant(w, s_w, wbits), q.fake_quant(b, s_w, bbits)


def _apply_mlp_quant(
    layers,
    x: jax.Array,
    qc,
    last_linear: bool,
    cdtype=jnp.float32,
    lsq_steps=None,
) -> jax.Array:
    """Weight-only QAT MLP (quantize_activation=False branch,
    quant_modules.py:138-186: out = linear(x, w_int, b_int) * s_w, which is
    exactly linear(x, fake_quant(w), fake_quant(b)) since the per-out-channel
    rescale commutes with the matmul).

    Alternate schemes mirror the ysx driver's create_mlp dispatch
    (dlrm_s_pytorch_single_gpu_ysx.py:299-345): "pact" = DoReFa fake-quant
    of weights AND bias at weight_bit (QuantLinearPACT, quant_pact_dorefa.
    py:42-53); "lsq" = learned-step fake-quant, per-out-channel steps for
    weights + per-tensor for bias (QuantLinearLSQ) — `lsq_steps` carries
    the per-layer trainable steps (params["lsq_mlp"][part])."""
    n = len(layers)
    for i, layer in enumerate(layers):
        if qc.quant_scheme == "pact":
            w_fq = q.fake_quant_pact(layer["w"], qc.weight_bit)
            b_fq = q.fake_quant_pact(layer["b"], qc.weight_bit)
        elif qc.quant_scheme == "lsq":
            st = lsq_steps[i]
            w_fq = q.fake_quant_lsq(
                layer["w"], st["w"], qc.weight_bit, per_channel=True
            )
            b_fq = q.fake_quant_lsq(layer["b"], st["b"], qc.weight_bit)
        else:
            # Reference drivers construct QuantLinear with bias_bit =
            # weight_bit (comm_grad.py:316-323); bias shares the weight
            # scale, so a small bias_bit clips biases larger than max|w|
            # (notably the final 1-output layer whose bias is ~N(0,1)).
            # bias_bit=32 (our default) keeps the scale-sharing but removes
            # the clip; set bias_bit == weight_bit for exact parity.
            s_w, w_fq, b_fq = _quant_linear_weights(
                layer, qc.weight_bit, qc.bias_bit, qc.mlp_channelwise
            )
        x = _mm(x, w_fq, cdtype) + b_fq
        if not (last_linear and i == n - 1):
            x = jax.nn.relu(x)
    return x


def _apply_mlp_quant_act(
    layers,
    x_fq: jax.Array,
    act_scale: jax.Array,
    qc,
    last_linear: bool,
) -> jax.Array:
    """Integer-activation QAT MLP (quantize_activation=True branch,
    quant_modules.py:128-180): x_int = x/s_in; out = ste_round(x_int @ w_int.T
    + b_int) * (s_w * s_in); scales chain through the stack. Per-tensor scales
    only (the reference's bias scale broadcast requires it)."""
    n = len(layers)
    x, s_in = x_fq, act_scale
    for i, layer in enumerate(layers):
        w = layer["w"]
        s_w = q.symmetric_quantization_params(qc.weight_bit, jnp.min(w), jnp.max(w))
        w_int = q.quantize_ste(w, s_w, qc.weight_bit)
        s_b = jax.lax.stop_gradient(s_w * s_in)
        b_int = q.quantize_ste(layer["b"], s_b, qc.bias_bit)
        x_int = x / jax.lax.stop_gradient(s_in)
        out_int = q.ste_round(x_int @ w_int.T + b_int)
        s_out = jax.lax.stop_gradient(s_w * s_in)
        x = out_int * s_out
        s_in = s_out
        if not (last_linear and i == n - 1):
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Embedding application
# ---------------------------------------------------------------------------


def trick_pooled_lookup(
    config: DLRMConfig,
    table: dict,
    indices: jax.Array,  # [B, P]
    mask: Optional[jax.Array],
) -> jax.Array:  # [B, D]
    """Pooled lookup for one QR/MD compositional table entry (the dict
    dispatch of the reference's create_emb, dlrm_s_pytorch.py:239-286).
    Shared by lookup_all and the distributed steps, which carry trick
    tables replicated (they are small by construction) and differentiate
    through this lookup directly."""
    if "q" in table:
        return tricks.qr_pooled_lookup(
            table, indices, mask,
            collisions=config.qr_collisions,
            operation=config.qr_operation,
        )
    return tricks.md_pooled_lookup(table, indices, mask)


def splice_trick_pooled(
    config: DLRMConfig,
    emb_trick: Dict[str, dict],  # {str(k): trick-table params} differentiable
    vw,  # list of per-table pooling weights (stop-gradded as desired) or None
    indices: jax.Array,  # [T, B, P]
    mask: Optional[jax.Array],
    pooled: jax.Array,  # [T, B, D] stop-grad pooled stack (lookup_all output)
    trick_ks,
) -> jax.Array:
    """Recompute QR/MD pooled outputs from DIFFERENTIABLE trick params and
    splice them into the stop-grad pooled stack.

    This is how every engine keeps embedding gradients sparse while QR/MD
    tables (whose gradients are dense and tiny by construction) ride the
    dense-autodiff channel: autodiff is cut at `pooled`, and the trick
    entries are recomputed here from `emb_trick` so their grads flow; the
    stop-grad copies inside `pooled` are spliced out and dead-code
    eliminated by XLA. Shared by parallel/comm_grad.py and the single-chip
    sparse step (train_step._build_sparse_step_fn)."""
    parts = []
    for k in range(config.num_tables):
        if k in trick_ks:
            m = mask[k] if mask is not None else None
            if config.weighted_pooling is not None:
                w_rows = jnp.take(vw[k], indices[k], axis=0)
                m = w_rows if m is None else m * w_rows
            parts.append(
                trick_pooled_lookup(
                    config, emb_trick[str(k)], indices[k], m
                ).astype(jnp.float32)
            )
        else:
            parts.append(pooled[k])
    return jnp.stack(parts)


def lookup_all(
    config: DLRMConfig,
    params: Params,
    indices: jax.Array,  # [T, B, P]
    mask: Optional[jax.Array],
    full_precision: bool = True,
) -> jax.Array:  # [T, B, D]
    """Raw pooled lookups for all tables (differentiable through the tables).

    PACT weight-side fake-quant happens here (the gather must see quantized
    rows, quant_pact_dorefa.py:97-105); HAWQ/LSQ pooled-output quant happens
    in `emb_postprocess`.
    """
    qc = config.quant
    pact = (
        qc.enabled
        and qc.quantize_emb
        and not full_precision
        and qc.quant_scheme == "pact"
    )
    outs = []
    for k, table in enumerate(params["emb"]):
        m = mask[k] if mask is not None else None
        if config.weighted_pooling is not None:
            vw = params["v_W"][k]
            if config.weighted_pooling == "fixed":
                vw = jax.lax.stop_gradient(vw)
            # per_sample_weights = v_W[idx] (apply_emb,
            # dlrm_s_pytorch.py:407-411), composed with the bag mask
            w_rows = jnp.take(vw, indices[k], axis=0)  # [B, P]
            m = w_rows if m is None else m * w_rows
        if isinstance(table, dict):
            # QR / MD compositional tables (full-precision even under QAT —
            # reference create_emb dispatch, comm_grad.py:360-383)
            pooled = trick_pooled_lookup(config, table, indices[k], m)
        else:
            if pact:
                table = q.fake_quant_pact(table, qc.embedding_bit)
            if 0 < table.shape[0] <= config.onehot_lookup_max_rows:
                # small table: MXU one-hot matmul instead of the serial
                # row gather (ops/pallas/onehot_update.py)
                from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
                    pooled_lookup_onehot_auto,
                )

                pooled = pooled_lookup_onehot_auto(table, indices[k], m)
            else:
                pooled = pooled_lookup(table, indices[k], m)
        outs.append(pooled.astype(jnp.float32))  # compute path stays fp32
    return jnp.stack(outs)  # [T, B, D]


def emb_postprocess(
    config: DLRMConfig,
    params: Params,
    pooled: jax.Array,  # [T, B, D] raw pooled lookups
    qstate: QuantState,
    full_precision: bool,
    lsq_numel_scale: float = 1.0,
) -> jax.Array:
    """Pooled-output fake-quant per table.

    HAWQ/DQRM scheme (QuantEmbeddingBagTwo forward,
    quant_modules_not_quantize_grad.py:362-395): fake-quant the pooled [B, D]
    output with the table-wide scale — the DQRM trick that avoids quantizing
    the whole table every step. LSQ uses a learned per-table step
    (quant_learned_step_size_quan.py:65-100). PACT is handled in lookup_all.
    """
    qc = config.quant
    if (
        not qc.enabled
        or full_precision
        or not qc.quantize_emb
        or qc.quant_scheme == "pact"
    ):
        return pooled
    outs = []
    for k in range(config.num_tables):
        if config.table_kind(k) != "dense":
            outs.append(pooled[k])  # QR/MD tables stay full-precision
        elif qc.quant_scheme == "lsq":
            outs.append(
                q.fake_quant_lsq(
                    pooled[k], params["lsq_emb"][k], qc.embedding_bit,
                    numel_scale=lsq_numel_scale,
                )
            )
        else:  # hawq (DQRM default)
            outs.append(q.fake_quant(pooled[k], qstate.emb_scales[k], qc.embedding_bit))
    return jnp.stack(outs)


def apply_emb(
    config: DLRMConfig,
    params: Params,
    indices: jax.Array,  # [T, B, P]
    mask: Optional[jax.Array],
    qstate: QuantState,
    full_precision: bool,
    train: bool,
) -> jax.Array:  # [T, B, D]
    """Per-table pooled lookups with optional pooled-output fake-quant
    (apply_emb, dlrm_s_pytorch_comm_grad.py:614-679)."""
    pooled = lookup_all(config, params, indices, mask, full_precision)
    return emb_postprocess(config, params, pooled, qstate, full_precision)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def forward(
    config: DLRMConfig,
    params: Params,
    batch: Batch,
    qstate: Optional[QuantState] = None,
    *,
    train: bool = True,
    full_precision: bool = False,
    raw_pooled: Optional[jax.Array] = None,
    lsq_numel_scale: float = 1.0,
) -> Tuple[jax.Array, QuantState]:
    """Full DLRM forward pass. Returns (logits [B], new QuantState).

    FP32 path mirrors `sequential_forward` (dlrm_s_pytorch.py:590-615); QAT
    paths mirror the quantized forward (comm_grad.py:809-895).

    `raw_pooled` optionally injects precomputed raw pooled lookups [T, B, D]
    (pre fake-quant). The distributed comm-grad path uses this to cut
    autodiff at the pooled outputs and extract sparse table gradients
    without densifying (parallel/comm_grad.py); the hybrid path injects the
    post-all-to-all pooled embeddings.
    """
    qc = config.quant
    if qstate is None:
        qstate = init_quant_state(config)
    quantizing = qc.enabled and not full_precision
    # bf16 matmuls apply to the FP and weight-QAT MLP paths and the dot
    # interaction; the integer-activation chain stays fp32 (exact-integer
    # ste_round semantics).
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32

    def get_ly(full_precision_emb: bool) -> jax.Array:
        pooled = raw_pooled
        if pooled is None:
            pooled = lookup_all(
                config, params, batch.indices, batch.mask, full_precision_emb
            )
        return emb_postprocess(
            config, params, pooled, qstate, full_precision_emb,
            lsq_numel_scale=lsq_numel_scale,
        )

    new_act_min = qstate.act_min
    new_act_max = qstate.act_max

    if not quantizing:
        x = _apply_mlp_fp(params["bot"], batch.dense, last_linear=False, cdtype=cdtype)
        ly = get_ly(True)
        z = (
            dot_interaction(x, ly, config.interact_itself, compute_dtype=cdtype)
            if config.interaction == "dot"
            else cat_interaction(x, ly)
        )
        logits = _apply_mlp_fp(params["top"], z, last_linear=True, cdtype=cdtype)
    elif qc.quantize_activation and qc.quantize_mlp:
        # quant_input QuantAct -> integer MLP chains (comm_grad.py:863-879).
        x_fq, s_act, new_min0, new_max0 = _quant_act(
            batch.dense, qc.activation_bit, qstate.act_min[0], qstate.act_max[0],
            qc.act_range_momentum, train, qc.act_percentile,
        )
        fixed = qstate.act_fixed > 0
        new_act_min = new_act_min.at[0].set(
            jnp.where(fixed, qstate.act_min[0], new_min0)
        )
        new_act_max = new_act_max.at[0].set(
            jnp.where(fixed, qstate.act_max[0], new_max0)
        )
        x = _apply_mlp_quant_act(params["bot"], x_fq, s_act, qc, last_linear=False)
        ly = get_ly(full_precision)
        z = (
            quantized_dot_interaction(x, ly, qc.interaction_bit, config.interact_itself)
            if qc.modify_feature_interaction
            else dot_interaction(x, ly, config.interact_itself)
        )
        # quant_feature_outputs QuantAct (comm_grad.py:806 interact tail).
        z_fq, s_feat, new_min1, new_max1 = _quant_act(
            z, qc.activation_bit, qstate.act_min[1], qstate.act_max[1],
            qc.act_range_momentum, train, qc.act_percentile,
        )
        new_act_min = new_act_min.at[1].set(
            jnp.where(fixed, qstate.act_min[1], new_min1)
        )
        new_act_max = new_act_max.at[1].set(
            jnp.where(fixed, qstate.act_max[1], new_max1)
        )
        logits = _apply_mlp_quant_act(params["top"], z_fq, s_feat, qc, last_linear=True)
    else:
        # Weight-only MLP quant (or emb-only when quantize_mlp=False):
        # comm_grad.py:852-859.
        lsq_mlp = params.get("lsq_mlp")
        mlp_fn = (
            lambda part, x, last_linear: _apply_mlp_fp(
                params[part], x, last_linear, cdtype=cdtype
            )
        ) if not qc.quantize_mlp else (
            lambda part, x, last_linear: _apply_mlp_quant(
                params[part], x, qc, last_linear, cdtype=cdtype,
                lsq_steps=lsq_mlp[part] if lsq_mlp is not None else None,
            )
        )
        dense_in = batch.dense
        if qc.quantize_activation and not qc.quantize_mlp:
            # Reference branch 1 (comm_grad.py:846-853): quantized
            # embeddings + FP32 MLPs still pass the dense input through
            # quant_input (QuantAct), without scale chaining.
            dense_in, _, new_min0, new_max0 = _quant_act(
                batch.dense, qc.activation_bit, qstate.act_min[0],
                qstate.act_max[0], qc.act_range_momentum, train,
                qc.act_percentile,
            )
            fixed = qstate.act_fixed > 0
            new_act_min = new_act_min.at[0].set(
                jnp.where(fixed, qstate.act_min[0], new_min0)
            )
            new_act_max = new_act_max.at[0].set(
                jnp.where(fixed, qstate.act_max[0], new_max0)
            )
        x = mlp_fn("bot", dense_in, last_linear=False)
        ly = get_ly(full_precision)
        z = (
            quantized_dot_interaction(x, ly, qc.interaction_bit, config.interact_itself)
            if qc.modify_feature_interaction
            else (
                dot_interaction(x, ly, config.interact_itself, compute_dtype=cdtype)
                if config.interaction == "dot"
                else cat_interaction(x, ly)
            )
        )
        logits = mlp_fn("top", z, last_linear=True)

    logits = logits.reshape(-1)
    new_qstate = qstate._replace(act_min=new_act_min, act_max=new_act_max)
    return logits, new_qstate


def predict(
    config: DLRMConfig,
    params: Params,
    batch: Batch,
    qstate: Optional[QuantState] = None,
    full_precision: bool = False,
) -> jax.Array:
    """Click probability with the reference's loss_threshold clamp
    (dlrm_s_pytorch.py:607-614)."""
    logits, _ = forward(
        config, params, batch, qstate, train=False, full_precision=full_precision
    )
    p = jax.nn.sigmoid(logits)
    if 0.0 < config.loss_threshold < 1.0:
        p = jnp.clip(p, config.loss_threshold, 1.0 - config.loss_threshold)
    return p


def bce_loss(
    logits: jax.Array,
    labels: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean binary cross-entropy on logits — the stable form of the
    reference's Sigmoid + nn.BCELoss (dlrm_s_pytorch.py:142-153). Optional
    per-sample weights reproduce the WBCE path (`loss_ws` weighted loss,
    dlrm_s_pytorch.py:144-152, mlperf terabyte mode)."""
    per = (
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if weights is not None:
        return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.mean(per)


def training_loss(
    config: DLRMConfig,
    logits: jax.Array,
    labels: jax.Array,
) -> jax.Array:
    """Loss dispatch on config.loss_function (dlrm_s_pytorch.py:140-152 +
    ctor :376-388): "bce" = stable BCE-with-logits; "mse" = MSELoss on the
    sigmoid probabilities; "wbce" = per-class weighted BCE — weight
    loss_weights[y] per sample, plain mean of the weighted terms (the
    reference's `(loss_ws_ * loss_fn_).mean()`, NOT a normalized weighted
    mean)."""
    lf = config.loss_function
    if lf == "mse":
        return jnp.mean((jax.nn.sigmoid(logits) - labels) ** 2)
    per = (
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if lf == "wbce":
        w0, w1 = config.loss_weights
        w = jnp.where(labels > 0.5, w1, w0)
        return jnp.mean(w * per)
    return jnp.mean(per)
