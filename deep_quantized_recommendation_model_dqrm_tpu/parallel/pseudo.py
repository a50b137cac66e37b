"""Pseudo-multi-worker simulation: N data-parallel workers on ONE chip.

Re-design of the reference's validation drivers
`dlrm_s_pytorch_pseudo_multigpu.py` / `pseudo_cpustb.py` (SURVEY §3.4): the
mini-batch is split into N micro-batches; each micro-step quantizes its
gradients into accumulation buffers (`grad_buffer_update_added_quantization`,
sgd_quantized_gradients.py:56-156); after N micro-steps the buffers are
dequantized and applied by manual SGD (`weights_update_added_quantization`
:349-421) and zeroed (`grad_buffer_zeroing` :231-312).

Exact reference semantics (verified by the A/B harness,
tests/test_reference_parity.py::test_pseudo_multigpu_trajectory_matches):

- embedding grads are COALESCED before scale/quantize
  (quantize_emb_grad, sgd_quantized_gradients.py:539-561: `.coalesce()`
  then `symmetric_linear_quantization_param_two` over the summed unique
  rows); the per-table scale is computed at the FIRST micro-step of each
  round and reused (zero-check at :78-82), and the integer buffer is
  dequantized by scale/N at apply (:368-371).
- MLP weight grads use PER-CHANNEL scales (quantize_linear_grad :563-600,
  per_channel=True default: min/max over dim 1) and bias grads a per-tensor
  scale (quantize_bias_grad :602-641), both with ERROR COMPENSATION
  (err_compensation=True at the pseudo call sites :104-137): the residual
  `ec = (g + ec_prev) - q * scale` persists across micro-steps AND rounds
  (grad_buffer_zeroing never clears it).
- apply: `w -= lr * buffer * scale / N` (weights_update_added_quantization
  :368-402), then buffers and cached scales are zeroed for the next round.

TPU-native: ONE jitted step runs the whole simulated round as a
`lax.scan` over the N micro-batches (no Python loop, no buffer zoo). This
was the reference's way of validating the distributed algorithm without a
cluster; here it doubles as a single-chip regression harness for the
comm_grad math.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
    coalesce_sparse_grad,
    rows_grad_from_pooled,
)
from deep_quantized_recommendation_model_dqrm_tpu.optim import lr_policy


class PseudoState(NamedTuple):
    params: Any
    qstate: dlrm.QuantState
    ec: Any  # {"bot"/"top": [{"w","b"}]} error-compensation residuals


def _zero_ec(params):
    return {
        part: [
            {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])}
            for l in params[part]
        ]
        for part in ("bot", "top")
    }


def init_pseudo_state(config: DLRMConfig, tc: TrainConfig, seed=None) -> PseudoState:
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    return PseudoState(
        params=params, qstate=dlrm.init_quant_state(config), ec=_zero_ec(params)
    )


def make_pseudo_train_step(
    config: DLRMConfig,
    tc: TrainConfig,
    num_workers: int,
):
    """Build the jitted simulated-N-worker step.

    Takes (PseudoState, Batch of size B) where B % num_workers == 0; returns
    (new state, mean loss). Matches the reference flow: mini_batch_size //=
    N per worker (pseudo_multigpu.py:990), grad buffers accumulated over N
    micro-steps with the scale from the FIRST micro-step
    (sgd_quantized_gradients.py:74-94), one manual-SGD apply.
    """
    qc = config.quant
    gb = tc.grad_quant_bits
    if config.weighted_pooling == "learned":
        # The buffer algorithm only updates emb/bot/top
        # (weights_update_added_quantization, sgd_quantized_gradients.py:
        # 349-421) — learned pooling weights would silently never train,
        # in the reference too. "fixed" pooling works (no trainable v_W).
        raise NotImplementedError(
            "weighted_pooling='learned' is not supported by the pseudo "
            "step; use weighted_pooling='fixed' or parallelism=none"
        )
    if any(config.table_kind(k) != "dense" for k in range(config.num_tables)):
        # The reference's grad_buffer functions iterate emb_l expecting
        # .embedding_bag (sgd_quantized_gradients.py:75-95) — QR/MD would
        # crash there too.
        raise NotImplementedError(
            "QR/MD embeddings are not supported by the pseudo step "
            "(nor by the reference's); use parallelism=none"
        )

    def step_fn(state: PseudoState, batch: dlrm.Batch):
        params, qstate = state.params, state.qstate
        if qc.enabled:
            qstate = dlrm.update_emb_scales(config, params, qstate)

        B = batch.labels.shape[0]
        mb = B // num_workers
        # reshape into [N, mb, ...] micro-batches
        micro = dlrm.Batch(
            dense=batch.dense.reshape(num_workers, mb, -1),
            indices=jnp.moveaxis(
                batch.indices.reshape(batch.indices.shape[0], num_workers, mb, -1),
                1, 0,
            ),  # [N, T, mb, P]
            labels=batch.labels.reshape(num_workers, mb),
            mask=None
            if batch.mask is None
            else jnp.moveaxis(
                batch.mask.reshape(batch.mask.shape[0], num_workers, mb, -1), 1, 0
            ),
        )

        mlp_params = {k: v for k, v in params.items() if k != "emb"}
        table_rows = [t.shape[0] for t in params["emb"]]

        def micro_grads(mb_batch: dlrm.Batch):
            raw_pooled = dlrm.lookup_all(
                config,
                {**params, "emb": [jax.lax.stop_gradient(t) for t in params["emb"]]},
                mb_batch.indices,
                mb_batch.mask,
                full_precision=not qc.enabled,
            )

            def loss_fn(mlp_p, pooled):
                logits, _ = dlrm.forward(
                    config,
                    {**mlp_p, "emb": params["emb"]},
                    mb_batch,
                    qstate,
                    train=True,
                    raw_pooled=pooled,
                )
                return dlrm.training_loss(config, logits, mb_batch.labels)

            loss, (mlp_g, g_pooled) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                mlp_params, raw_pooled
            )
            return loss, mlp_g, g_pooled

        def scan_body(carry, mb_batch):
            mlp_buf, scales, ec, first = carry
            loss, mlp_g, g_pooled = micro_grads(mb_batch)

            # --- MLP: INT8 quantize into buffer (scale cached first step,
            # per-channel for weights / per-tensor for bias, error
            # compensation; quantize_linear_grad / quantize_bias_grad,
            # sgd_quantized_gradients.py:563-641) ---
            new_mlp_buf = {}
            new_scales = dict(scales)
            new_ec = {}
            for part in ("bot", "top"):
                bufs, part_scales, part_ec = [], [], []
                for li, (gl, bl) in enumerate(zip(mlp_g[part], mlp_buf[part])):
                    entry, sc_entry, ec_entry = {}, {}, {}
                    for key in ("w", "b"):
                        g = gl[key]
                        if gb >= 32:
                            # non-quantized buffer path: grad/N accumulated,
                            # no EC (grad_buffer_update, :28-55)
                            entry[key] = bl[key] + g / num_workers
                            sc_entry[key] = scales[part][li][key]
                            ec_entry[key] = ec[part][li][key]
                            continue
                        g_eff = g + ec[part][li][key]
                        if key == "w":
                            fresh = q.symmetric_quantization_params(
                                gb,
                                jnp.min(g_eff, axis=1),
                                jnp.max(g_eff, axis=1),
                            )  # per-out-channel [out]
                        else:
                            fresh = q.symmetric_quantization_params(
                                gb, jnp.min(g_eff), jnp.max(g_eff)
                            )
                        sc = jnp.where(first, fresh, scales[part][li][key])
                        qv = q.quantize_ste(g_eff, sc, gb)
                        dq = qv * (sc.reshape(-1, 1) if key == "w" else sc)
                        ec_entry[key] = g_eff - dq
                        sc_entry[key] = sc
                        entry[key] = bl[key] + qv
                    bufs.append(entry)
                    part_scales.append(sc_entry)
                    part_ec.append(ec_entry)
                new_mlp_buf[part] = bufs
                new_scales[part] = part_scales
                new_ec[part] = part_ec

            # --- embeddings: coalesce -> scale (first micro-step) ->
            # quantize (quantize_emb_grad, :539-561) ---
            new_emb_ids = []
            new_emb_vals = []
            emb_scales = []
            for k in range(len(params["emb"])):
                ids, vals = rows_grad_from_pooled(
                    g_pooled[k],
                    mb_batch.indices[k],
                    mb_batch.mask[k] if mb_batch.mask is not None else None,
                )
                uids, uvals = coalesce_sparse_grad(
                    ids, vals, table_rows[k], max_unique=ids.shape[0]
                )
                if gb >= 32:
                    new_emb_ids.append(uids)
                    new_emb_vals.append(uvals)
                    emb_scales.append(jnp.float32(1.0))
                    continue
                sc = scales["emb"][k]
                sc = jnp.where(
                    first,
                    q.symmetric_quantization_params(
                        gb, jnp.min(uvals), jnp.max(uvals)
                    ),
                    sc,
                )
                emb_scales.append(sc)
                new_emb_ids.append(uids)
                new_emb_vals.append(q.quantize_ste(uvals, sc, gb))
            new_scales["emb"] = jnp.stack(emb_scales)

            carry = (new_mlp_buf, new_scales, new_ec, jnp.asarray(False))
            return carry, (loss, jnp.stack(new_emb_ids), jnp.stack(new_emb_vals))

        zero_mlp_buf = {
            part: [
                {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])}
                for l in params[part]
            ]
            for part in ("bot", "top")
        }
        init_scales = {
            part: [
                {
                    "w": jnp.ones((l["w"].shape[0],), jnp.float32),
                    "b": jnp.float32(1.0),
                }
                for l in params[part]
            ]
            for part in ("bot", "top")
        }
        init_scales["emb"] = jnp.ones((len(params["emb"]),), jnp.float32)
        carry0 = (zero_mlp_buf, init_scales, state.ec, jnp.asarray(True))
        (mlp_buf, scales, ec, _), (losses, emb_ids, emb_q_vals) = jax.lax.scan(
            scan_body, carry0, micro
        )
        # emb_ids: [N, T, mb*P]; emb_q_vals: [N, T, mb*P, D]

        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        # --- apply: dequantize buffers, manual SGD
        # (weights_update_added_quantization :349-421) ---
        new_params = {}
        for part in ("bot", "top"):
            layers = []
            for l, buf, sc in zip(params[part], mlp_buf[part], scales[part]):
                upd = {}
                for key in ("w", "b"):
                    if gb < 32:
                        s = sc[key].reshape(-1, 1) if key == "w" else sc[key]
                        g_sum = buf[key] * (s / num_workers)
                    else:
                        g_sum = buf[key]  # already /N at accumulate
                    upd[key] = l[key] - lr * g_sum
                layers.append(upd)
            new_params[part] = layers
        new_emb = []
        T = len(params["emb"])
        for k in range(T):
            vals = emb_q_vals[:, k]  # [N, mb*P, D]
            if gb < 32:
                vals = vals * (scales["emb"][k] / num_workers)
            else:
                vals = vals / num_workers
            ids = emb_ids[:, k].reshape(-1)  # padded ids drop via mode="drop"
            new_emb.append(
                params["emb"][k]
                .at[ids]
                .add(-lr * vals.reshape(-1, vals.shape[-1]), mode="drop")
            )
        new_params["emb"] = new_emb
        # carry every other param key through unchanged (lsq_emb, fixed
        # v_W, ...) so the returned pytree structure matches the input
        for key in params:
            if key not in new_params:
                new_params[key] = params[key]

        new_qs = qstate._replace(step=qstate.step + 1)
        return PseudoState(new_params, new_qs, ec), jnp.mean(losses)

    return jax.jit(step_fn, donate_argnums=(0,))
