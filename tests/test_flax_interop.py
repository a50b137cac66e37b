"""Flax Module wrapper: parity with the functional core + optax training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.models.flax_module import (
    DLRM,
    predict_proba,
)

CFG = DLRMConfig(
    table_sizes=(60, 30, 10),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


def make_batch(cfg, B=16, seed=0):
    return random_batch(cfg, B, np.random.RandomState(seed))


class TestFlaxParity:
    def test_forward_matches_functional(self):
        model = DLRM(CFG, seed=3)
        b = make_batch(CFG)
        variables = model.init(jax.random.PRNGKey(0), b)
        logits = model.apply(variables, b, train=False)
        ref_params = dlrm.init_params(CFG, seed=3)
        ref_logits, _ = dlrm.forward(CFG, ref_params, b, train=False)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=1e-6
        )

    def test_qat_state_mutates(self):
        cfg = dataclasses.replace(
            CFG, quant=QuantConfig(enabled=True, scale_update_period=1)
        )
        model = DLRM(cfg)
        b = make_batch(cfg)
        variables = model.init(jax.random.PRNGKey(0), b)
        _, mut = model.apply(variables, b, train=True, mutable=["quant"])
        qs = mut["quant"]["state"]
        assert int(qs.step) == 1
        assert not np.allclose(np.asarray(qs.emb_scales), 1.0)

    def test_optax_training_loop(self):
        import optax

        model = DLRM(CFG)
        b = make_batch(CFG, B=64)
        variables = model.init(jax.random.PRNGKey(0), b)
        params = variables["params"]
        quant = variables["quant"]
        tx = optax.sgd(0.1)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, quant, opt_state, batch):
            def loss_fn(p):
                logits, mut = model.apply(
                    {"params": p, "quant": quant}, batch, train=True,
                    mutable=["quant"],
                )
                return dlrm.bce_loss(logits, batch.labels), mut["quant"]

            (loss, new_quant), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_quant, opt_state, loss

        losses = []
        rng = np.random.RandomState(1)
        for i in range(20):
            params, quant, opt_state, loss = step(
                params, quant, opt_state, random_batch(CFG, 64, rng)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] + 0.05

    def test_predict_proba(self):
        model = DLRM(CFG)
        b = make_batch(CFG)
        variables = model.init(jax.random.PRNGKey(0), b)
        p = predict_proba(model, variables, b)
        assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))
