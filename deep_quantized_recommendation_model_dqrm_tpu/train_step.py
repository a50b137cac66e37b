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
    if 0 <= tc.shift_bit_width_at_epoch <= epoch:
        wb = tc.shift_bit_width_to
    if quantize_mlp == qc.quantize_mlp and wb == qc.weight_bit:
        return config
    return dataclasses.replace(
        config, quant=dataclasses.replace(qc, quantize_mlp=quantize_mlp, weight_bit=wb)
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


def make_train_step(
    config: DLRMConfig, tc: TrainConfig
) -> Callable[[TrainState, dlrm.Batch], Tuple[TrainState, jax.Array]]:
    """Build the jitted train step. Donates the state for in-place updates
    (critical for GB-scale embedding tables in HBM)."""

    def step_fn(state: TrainState, batch: dlrm.Batch) -> Tuple[TrainState, jax.Array]:
        qstate = state.qstate
        if config.quant.enabled:
            # Periodic scale refresh (paper §3.2) before the forward, like
            # QuantEmbeddingBagTwo's in-forward recompute.
            qstate = dlrm.update_emb_scales(config, state.params, qstate)

        def loss_fn(params):
            logits, new_qs = dlrm.forward(config, params, batch, qstate, train=True)
            return dlrm.bce_loss(logits, batch.labels), new_qs

        (loss, new_qs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

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

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(
    config: DLRMConfig,
) -> Callable[[TrainState, dlrm.Batch], jax.Array]:
    """Jitted inference step returning click probabilities (the reference's
    `inference()` per-batch body, dlrm_s_pytorch.py:762-860)."""

    def eval_fn(state: TrainState, batch: dlrm.Batch) -> jax.Array:
        return dlrm.predict(config, state.params, batch, state.qstate)

    return jax.jit(eval_fn)
