"""Tests: quantized conv family, trace-driven synthetic, weighted BCE,
percentile QuantAct, distributed eval."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
    TraceSyntheticLoader,
    random_batch,
    trace_generate_indices,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.ops import quant_conv as qc

CFG = DLRMConfig(
    table_sizes=(64, 200, 30),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


class TestQuantConv:
    def test_conv_close_to_fp32(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (16,)).astype(np.float32))
        got = qc.quant_conv2d(x, w, b, bits=8)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05
        assert got.shape == (2, 8, 8, 16)

    def test_conv_grad_flows(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 2, 4)).astype(np.float32))
        g = jax.grad(lambda w: jnp.sum(qc.quant_conv2d(x, w, None, 4) ** 2))(w)
        assert np.all(np.isfinite(np.asarray(g))) and float(jnp.max(jnp.abs(g))) > 0

    def test_bn_folding(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (1, 1, 2, 3)).astype(np.float32))
        bn_s = jnp.asarray([2.0, 0.5, 1.0])
        bn_b = jnp.asarray([0.1, -0.1, 0.0])
        got = qc.quant_bn_conv2d(x, w, None, bn_s, bn_b, bits=8)
        ref = (
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            * bn_s
            + bn_b
        )
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05

    def test_pools_and_dropout(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        mx = qc.max_pool2d(x)
        av = qc.avg_pool2d(x)
        assert mx.shape == av.shape == (1, 2, 2, 1)
        assert float(mx[0, 0, 0, 0]) == 5.0
        assert float(av[0, 0, 0, 0]) == 2.5
        key = jax.random.PRNGKey(0)
        d = qc.quant_dropout(x, 0.5, key, train=True)
        assert d.shape == x.shape
        assert np.allclose(np.asarray(qc.quant_dropout(x, 0.5, key, train=False)), np.asarray(x))


class TestTraceSynthetic:
    def test_trace_locality_skews_access(self):
        rng = np.random.RandomState(0)
        tr = trace_generate_indices(10_000, 5000, rng, locality=0.9)
        uniq_hot = len(np.unique(tr))
        tr_u = trace_generate_indices(10_000, 5000, rng, locality=0.0)
        uniq_uniform = len(np.unique(tr_u))
        assert uniq_hot < uniq_uniform * 0.7  # locality concentrates rows

    def test_trace_loader_batches(self):
        loader = TraceSyntheticLoader(CFG, 16, 3, seed=1)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b.indices.shape == (3, 16, 1)
        sizes = np.asarray(CFG.table_sizes)
        assert np.all(np.asarray(b.indices)[:, :, 0].max(axis=1) < sizes)


class TestWeightedBCE:
    def test_weights_reduce_to_mean(self):
        logits = jnp.asarray([0.3, -0.7, 1.2])
        labels = jnp.asarray([1.0, 0.0, 1.0])
        w = jnp.ones(3)
        a = float(dlrm.bce_loss(logits, labels))
        b = float(dlrm.bce_loss(logits, labels, w))
        assert np.isclose(a, b, rtol=1e-6)

    def test_zero_weight_excludes_sample(self):
        logits = jnp.asarray([0.3, 100.0])
        labels = jnp.asarray([1.0, 0.0])
        w = jnp.asarray([1.0, 0.0])
        val = float(dlrm.bce_loss(logits, labels, w))
        only_first = float(dlrm.bce_loss(logits[:1], labels[:1]))
        assert np.isclose(val, only_first, rtol=1e-6)


class TestPercentileAct:
    def test_percentile_narrows_range(self):
        cfg = dataclasses.replace(
            CFG,
            quant=QuantConfig(
                enabled=True, quantize_activation=True, act_percentile=95.0,
                scale_update_period=1,
            ),
        )
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        b = random_batch(cfg, 64, np.random.RandomState(0))
        _, qs_pct = dlrm.forward(cfg, p, b, qs, train=True)
        cfg2 = dataclasses.replace(
            CFG,
            quant=QuantConfig(
                enabled=True, quantize_activation=True, scale_update_period=1
            ),
        )
        _, qs_full = dlrm.forward(cfg2, p, b, qs, train=True)
        assert float(qs_pct.act_max[0]) <= float(qs_full.act_max[0]) + 1e-6


class TestDPEval:
    def test_dp_eval_matches_single_chip(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            comm_grad,
            make_mesh,
        )

        tc = TrainConfig(batch_size=64)
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, tc)
        ev = comm_grad.make_dp_eval_step(CFG, mesh)
        b = random_batch(CFG, 64, np.random.RandomState(7))
        p_dp = np.asarray(ev(state, b))
        p_single = np.asarray(
            dlrm.predict(CFG, state.params, b, state.qstate)
        )
        np.testing.assert_allclose(p_dp, p_single, rtol=1e-5, atol=1e-6)
