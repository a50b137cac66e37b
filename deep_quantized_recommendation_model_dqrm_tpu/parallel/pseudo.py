"""Pseudo-multi-worker simulation: N data-parallel workers on ONE chip.

Re-design of the reference's validation drivers
`dlrm_s_pytorch_pseudo_multigpu.py` / `pseudo_cpustb.py` (SURVEY §3.4): the
mini-batch is split into N micro-batches; each micro-step quantizes its
gradients into accumulation buffers (`grad_buffer_update_added_quantization`,
sgd_quantized_gradients.py:56-156: sparse INT8 embedding grads with the
scale cached at the first micro-step, INT8 MLP grads with error
compensation); after N micro-steps the buffers are dequantized and applied
by manual SGD (`weights_update_added_quantization` :349-421) and zeroed
(`grad_buffer_zeroing` :231-312).

TPU-native: ONE jitted step runs the whole simulated round as a
`lax.scan` over the N micro-batches (no Python loop, no buffer zoo) —
the numerical semantics (per-micro-step quantization into a shared-scale
buffer, single apply) are preserved exactly. This was the reference's way
of validating the distributed algorithm without a cluster; here it doubles
as a single-chip regression harness for the comm_grad math.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
    rows_grad_from_pooled,
)
from deep_quantized_recommendation_model_dqrm_tpu.optim import lr_policy


class PseudoState(NamedTuple):
    params: Any
    qstate: dlrm.QuantState


def init_pseudo_state(config: DLRMConfig, tc: TrainConfig, seed=None) -> PseudoState:
    params = dlrm.init_params(config, seed if seed is not None else tc.seed)
    return PseudoState(params=params, qstate=dlrm.init_quant_state(config))


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
                return dlrm.bce_loss(logits, mb_batch.labels)

            loss, (mlp_g, g_pooled) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                mlp_params, raw_pooled
            )
            return loss, mlp_g, g_pooled

        def scan_body(carry, mb_batch):
            mlp_buf, emb_val_buf, scales, first = carry
            loss, mlp_g, g_pooled = micro_grads(mb_batch)

            # --- MLP: INT8 quantize into buffer (scale cached first step) ---
            new_mlp_buf = {}
            new_scales = dict(scales)
            for part in ("bot", "top"):
                bufs, layer_scales = [], []
                for li, (gl, bl) in enumerate(zip(mlp_g[part], mlp_buf[part])):
                    entry = {}
                    for key in ("w", "b"):
                        g = gl[key]
                        if gb >= 32:
                            entry[key] = bl[key] + g
                            layer_scales.append(jnp.float32(1.0))
                            continue
                        sc = scales[part][li][key]
                        sc = jnp.where(
                            first,
                            q.symmetric_quantization_params(
                                gb, jnp.min(g), jnp.max(g)
                            ),
                            sc,
                        )
                        layer_scales.append(sc)
                        entry[key] = bl[key] + q.quantize_ste(g, sc, gb)
                    bufs.append(entry)
                new_mlp_buf[part] = bufs
                new_scales[part] = [
                    {"w": layer_scales[2 * i], "b": layer_scales[2 * i + 1]}
                    for i in range(len(bufs))
                ]

            # --- embeddings: INT8 row-grads accumulated per micro-step ---
            new_emb_vals = []
            emb_scales = []
            for k in range(len(params["emb"])):
                _, vals = rows_grad_from_pooled(
                    g_pooled[k],
                    mb_batch.indices[k],
                    mb_batch.mask[k] if mb_batch.mask is not None else None,
                )
                if gb >= 32:
                    new_emb_vals.append(vals)
                    emb_scales.append(jnp.float32(1.0))
                    continue
                sc = scales["emb"][k]
                sc = jnp.where(
                    first,
                    q.symmetric_quantization_params(gb, jnp.min(vals), jnp.max(vals)),
                    sc,
                )
                emb_scales.append(sc)
                new_emb_vals.append(q.quantize_ste(vals, sc, gb))
            new_scales["emb"] = emb_scales

            carry = (
                new_mlp_buf,
                emb_val_buf,  # placeholder; emb values stacked via scan ys
                {
                    "bot": new_scales["bot"],
                    "top": new_scales["top"],
                    "emb": jnp.stack(emb_scales),
                },
                jnp.asarray(False),
            )
            return carry, (loss, jnp.stack(new_emb_vals))

        zero_mlp_buf = {
            part: [
                {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])}
                for l in params[part]
            ]
            for part in ("bot", "top")
        }
        init_scales = {
            "bot": [{"w": jnp.float32(1.0), "b": jnp.float32(1.0)} for _ in params["bot"]],
            "top": [{"w": jnp.float32(1.0), "b": jnp.float32(1.0)} for _ in params["top"]],
            "emb": jnp.ones((len(params["emb"]),), jnp.float32),
        }
        carry0 = (zero_mlp_buf, 0, init_scales, jnp.asarray(True))
        (mlp_buf, _, scales, _), (losses, emb_q_vals) = jax.lax.scan(
            scan_body, carry0, micro
        )
        # emb_q_vals: [N, T, mb*P, D]

        lr = lr_policy(
            tc.learning_rate,
            qstate.step + 1,
            tc.lr_num_warmup_steps,
            tc.lr_decay_start_step,
            tc.lr_num_decay_steps,
        )

        # --- apply: dequantize buffers, manual SGD, zero buffers ---
        new_params = {}
        for part in ("bot", "top"):
            layers = []
            for l, buf, sc in zip(params[part], mlp_buf[part], scales[part]):
                upd = {}
                for key in ("w", "b"):
                    g_sum = buf[key] * (sc[key] if gb < 32 else 1.0)
                    upd[key] = l[key] - lr * g_sum / num_workers
                layers.append(upd)
            new_params[part] = layers
        new_emb = []
        T = len(params["emb"])
        for k in range(T):
            vals = emb_q_vals[:, k]  # [N, mb*P, D]
            if gb < 32:
                vals = vals * scales["emb"][k]
            ids = jnp.moveaxis(
                batch.indices[k].reshape(num_workers, mb, -1), 0, 0
            ).reshape(-1)
            new_emb.append(
                params["emb"][k]
                .at[ids]
                .add(
                    -(lr / num_workers) * vals.reshape(-1, vals.shape[-1]),
                    mode="drop",
                )
            )
        new_params["emb"] = new_emb
        if "lsq_emb" in params:
            new_params["lsq_emb"] = params["lsq_emb"]

        new_qs = qstate._replace(step=qstate.step + 1)
        return PseudoState(new_params, new_qs), jnp.mean(losses)

    return jax.jit(step_fn, donate_argnums=(0,))
