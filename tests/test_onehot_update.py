"""MXU one-hot dense-grad kernel (ops/pallas/onehot_update.py) + its wiring
into the sparse train step (TrainConfig.onehot_update_max_rows).

The kernel itself is validated in Pallas interpret mode against a numpy
scatter reference; the step-level tests prove the dense-update optimizer
rewrite (SGD / Adagrad / RWSAdagrad touched-rows semantics) is trajectory-
identical to the scatter path.
"""

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
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
    dense_grad_auto,
    onehot_dense_grad,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_train_step,
)

TINY = DLRMConfig(
    table_sizes=(100, 50, 10),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


def _np_scatter(ids, vals, n):
    out = np.zeros((n, vals.shape[1]), np.float32)
    for i, v in zip(ids, vals):
        if 0 <= i < n:
            out[i] += v
    return out


class TestKernel:
    @pytest.mark.parametrize(
        "R,n,d",
        [(128, 1460, 16), (1000, 300, 16), (7, 4, 16), (513, 5652, 64),
         (2048, 129, 24)],
    )
    def test_matches_scatter_interpret(self, R, n, d):
        rng = np.random.RandomState(R + n)
        # include out-of-range ids on both sides (mode="drop" semantics)
        ids = rng.randint(-2, n + 2, size=R).astype(np.int32)
        vals = rng.normal(size=(R, d)).astype(np.float32)
        got = np.asarray(
            onehot_dense_grad(
                jnp.asarray(ids), jnp.asarray(vals), n, interpret=True
            )
        )
        np.testing.assert_allclose(
            got, _np_scatter(ids, vals, n), rtol=1e-5, atol=1e-5
        )

    def test_heavy_duplicates_sum(self):
        # every occurrence lands on one of 3 rows — pure accumulation test
        R, n, d = 512, 8, 16
        rng = np.random.RandomState(0)
        ids = rng.choice([0, 3, 7], size=R).astype(np.int32)
        vals = rng.normal(size=(R, d)).astype(np.float32)
        got = np.asarray(
            onehot_dense_grad(
                jnp.asarray(ids), jnp.asarray(vals), n, interpret=True
            )
        )
        np.testing.assert_allclose(
            got, _np_scatter(ids, vals, n), rtol=1e-4, atol=1e-4
        )

    def test_auto_fallback_matches(self):
        # on the CPU backend dense_grad_auto takes the XLA scatter path
        rng = np.random.RandomState(3)
        ids = rng.randint(0, 50, size=200).astype(np.int32)
        vals = rng.normal(size=(200, 8)).astype(np.float32)
        got = np.asarray(dense_grad_auto(jnp.asarray(ids), jnp.asarray(vals), 50))
        np.testing.assert_allclose(
            got, _np_scatter(ids, vals, 50), rtol=1e-5, atol=1e-6
        )


class TestForwardLookup:
    @pytest.mark.parametrize("B,P,n,d", [(32, 1, 100, 16), (17, 3, 300, 8),
                                         (64, 2, 9, 24)])
    def test_matches_gather_interpret(self, B, P, n, d):
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            pooled_lookup,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
            onehot_pooled_lookup,
        )

        rng = np.random.RandomState(B + n)
        table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, size=(B, P)).astype(np.int32))
        w = jnp.asarray(rng.uniform(0, 1, size=(B, P)).astype(np.float32))
        got = onehot_pooled_lookup(table, idx, w, True)
        ref = pooled_lookup(table, idx, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_vjp_matches_gather_vjp(self):
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            pooled_lookup,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
            onehot_pooled_lookup,
        )

        rng = np.random.RandomState(0)
        B, P, n, d = 16, 2, 50, 8
        table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, size=(B, P)).astype(np.int32))
        w = jnp.asarray(rng.uniform(0, 1, size=(B, P)).astype(np.float32))

        def f_oh(t, w_):
            return jnp.sum(onehot_pooled_lookup(t, idx, w_, True) ** 2)

        def f_ref(t, w_):
            return jnp.sum(pooled_lookup(t, idx, w_) ** 2)

        gt, gw = jax.grad(f_oh, argnums=(0, 1))(table, w)
        rt, rw = jax.grad(f_ref, argnums=(0, 1))(table, w)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(rt),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-5)

    def test_lookup_all_trajectory_matches(self, monkeypatch):
        """onehot_lookup_max_rows swaps the forward gather — dense-autodiff
        step trajectories stay identical. DQRM_ONEHOT_INTERPRET=1 forces the
        real kernel (interpreter mode) on the CPU backend so this covers the
        lookup_all wiring (mask=None -> ones, dtype cast) and the custom_vjp
        end-to-end, not the gather fallback."""
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            make_train_step as mts,
        )

        monkeypatch.setenv("DQRM_ONEHOT_INTERPRET", "1")
        cfg1 = dataclasses.replace(TINY, onehot_lookup_max_rows=1000)
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s0 = init_train_state(TINY, tc)
        s1 = init_train_state(cfg1, tc)
        step0 = mts(TINY, tc)
        step1 = mts(cfg1, tc)
        rng = np.random.RandomState(5)
        for _ in range(3):
            b = random_batch(TINY, 32, rng)
            s0, l0 = step0(s0, b)
            s1, l1 = step1(s1, b)
            assert np.isclose(float(l0), float(l1), rtol=1e-5)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )


class TestSparseStepOnehot:
    @pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
    def test_trajectory_matches_scatter_path(self, opt):
        tc0 = TrainConfig(batch_size=32, learning_rate=0.1, optimizer=opt)
        tc1 = tc0.replace(onehot_update_max_rows=64)  # covers tables 50, 10
        s0 = init_train_state(TINY, tc0)
        s1 = init_train_state(TINY, tc1)
        step0 = make_train_step(TINY, tc0, sparse_emb_grad=True)
        step1 = make_train_step(TINY, tc1, sparse_emb_grad=True)
        rng = np.random.RandomState(0)
        for _ in range(4):
            b = random_batch(TINY, 32, rng)
            s0, l0 = step0(s0, b)
            s1, l1 = step1(s1, b)
            assert np.isclose(float(l0), float(l1), rtol=1e-5)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )
        if opt != "sgd":
            for a, c in zip(s0.opt_state["emb"], s1.opt_state["emb"]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-7
                )

    def test_bf16_tables_track_scatter_path(self):
        """bf16 tables: the dense path accumulates in fp32 and rounds once
        (scatter accumulates in bf16) — trajectories TRACK within bf16 ulp,
        not bit-exact (documented in config.py)."""
        cfg = dataclasses.replace(TINY, table_dtype="bfloat16")
        tc0 = TrainConfig(batch_size=32, learning_rate=0.1)
        tc1 = tc0.replace(onehot_update_max_rows=1000)
        s0 = init_train_state(cfg, tc0)
        s1 = init_train_state(cfg, tc1)
        step0 = make_train_step(cfg, tc0, sparse_emb_grad=True)
        step1 = make_train_step(cfg, tc1, sparse_emb_grad=True)
        rng = np.random.RandomState(11)
        for _ in range(4):
            b = random_batch(cfg, 32, rng)
            s0, l0 = step0(s0, b)
            s1, l1 = step1(s1, b)
            assert np.isclose(float(l0), float(l1), rtol=1e-2)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                rtol=2e-2, atol=2e-3,
            )

    def test_qat_variable_pooling_masked(self):
        cfg = dataclasses.replace(
            TINY,
            pooling_size=3,
            quant=QuantConfig(enabled=True, scale_update_period=2),
        )
        tc0 = TrainConfig(batch_size=16, learning_rate=0.05)
        tc1 = tc0.replace(onehot_update_max_rows=1000)  # all tables
        s0 = init_train_state(cfg, tc0)
        s1 = init_train_state(cfg, tc1)
        step0 = make_train_step(cfg, tc0, sparse_emb_grad=True)
        step1 = make_train_step(cfg, tc1, sparse_emb_grad=True)
        rng = np.random.RandomState(7)
        for _ in range(3):
            b = random_batch(cfg, 16, rng)  # P=3 carries a dedupe mask
            assert b.mask is not None
            s0, _ = step0(s0, b)
            s1, _ = step1(s1, b)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )
