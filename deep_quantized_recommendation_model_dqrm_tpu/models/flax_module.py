"""Flax interop: the DLRM/DQRM model as a `flax.linen.Module`.

The canonical definition stays functional (`models/dlrm.py`); this thin
wrapper exposes it through the Module API the broader JAX ecosystem expects
(optax training loops, orbax param trees, model surgery tooling). Parameters
live under the standard flax `params` collection with the same pytree layout
as `dlrm.init_params`; QAT state (scales, act ranges, step) lives in the
`quant` variable collection, mirroring how the reference keeps them as
registered torch buffers (quant_modules.py:235-245).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm


class DLRM(nn.Module):
    """Flax Module wrapping the functional DLRM/DQRM.

    Usage:
        model = DLRM(config)
        variables = model.init(rng, batch)           # {"params":…, "quant":…}
        logits, mutated = model.apply(
            variables, batch, train=True, mutable=["quant"])
    """

    config: DLRMConfig
    seed: int = 0

    @nn.compact
    def __call__(
        self,
        batch: dlrm.Batch,
        train: bool = True,
        full_precision: bool = False,
    ) -> jax.Array:
        cfg = self.config

        init_params = dlrm.init_params(cfg, seed=self.seed)
        params = {
            key: self.param(key, lambda rng, v=val: v)
            for key, val in init_params.items()
        }

        qs0 = dlrm.init_quant_state(cfg)
        qvar = self.variable(
            "quant", "state", lambda: qs0
        )
        qstate = qvar.value
        if cfg.quant.enabled and train and not self.is_initializing():
            qstate = dlrm.update_emb_scales(cfg, params, qstate)

        logits, new_qs = dlrm.forward(
            cfg, params, batch, qstate, train=train, full_precision=full_precision
        )
        if train and not self.is_initializing():
            qvar.value = new_qs._replace(step=qstate.step + 1)
        return logits


def predict_proba(model: DLRM, variables, batch: dlrm.Batch) -> jax.Array:
    """Convenience: sigmoid probabilities without mutating quant state."""
    logits = model.apply(variables, batch, train=False)
    p = jax.nn.sigmoid(logits)
    cfg = model.config
    if 0.0 < cfg.loss_threshold < 1.0:
        p = jnp.clip(p, cfg.loss_threshold, 1.0 - cfg.loss_threshold)
    return p
