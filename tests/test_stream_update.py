"""Tile-streaming scatter-add + per-row DMA update kernels
(ops/pallas/stream_update.py) — equivalence vs the XLA scatter.

Both run in Pallas interpreter mode on the CPU CI (the real-TPU timings
live in scripts/bench_stream_update.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
    coalesce_sparse_grad,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.stream_update import (
    dma_row_update,
    sort_sparse_grad,
    stream_scatter_add,
    stream_update_auto,
)


def _ref(table, ids, vals):
    return jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(vals).astype(table.dtype), mode="drop"
    )


class TestStreamScatterAdd:
    @pytest.mark.parametrize(
        "R,U,seed",
        [(1000, 300, 0), (777, 130, 1), (512, 512, 2), (2048, 64, 3),
         (130, 700, 4)],
    )
    def test_matches_scatter(self, R, U, seed):
        rng = np.random.default_rng(seed)
        D = 16
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = rng.integers(0, R, size=U).astype(np.int32)
        ids[: U // 4] = ids[0]  # heavy duplicates
        vals = rng.normal(size=(U, D)).astype(np.float32)
        order = np.argsort(ids, kind="stable")
        out = stream_scatter_add(
            jnp.asarray(table),
            jnp.asarray(ids[order]),
            jnp.asarray(vals[order]),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, ids, vals)),
            rtol=1e-5, atol=1e-5,
        )

    def test_oob_padding_dropped(self):
        rng = np.random.default_rng(7)
        R, D, U = 300, 16, 128
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = np.sort(rng.integers(0, R, size=U - 30)).astype(np.int32)
        pads = R + np.arange(30, dtype=np.int32)  # coalesce-style padding
        sids = np.concatenate([ids, pads])
        vals = rng.normal(size=(U, D)).astype(np.float32)
        out = stream_scatter_add(
            jnp.asarray(table), jnp.asarray(sids), jnp.asarray(vals),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, sids, vals)),
            rtol=1e-5, atol=1e-5,
        )

    def test_bf16_table_f32_accumulation(self):
        rng = np.random.default_rng(8)
        R, D, U = 400, 64, 256
        table = rng.normal(size=(R, D)).astype(jnp.bfloat16)
        ids = np.sort(rng.integers(0, R, size=U)).astype(np.int32)
        vals = rng.normal(size=(U, D)).astype(np.float32)
        out = stream_scatter_add(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(vals),
            interpret=True,
        )
        # Kernel accumulates in f32 and casts once; the scatter rounds to
        # bf16 per duplicate — agree to bf16 resolution.
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(_ref(table, ids, vals), np.float32),
            rtol=0.05, atol=0.1,
        )

    def test_empty_updates(self):
        table = jnp.ones((100, 16), jnp.float32)
        sids = jnp.full((32,), 100, jnp.int32)  # all padding
        svals = jnp.ones((32, 16), jnp.float32)
        out = stream_scatter_add(table, sids, svals, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(table))

    def test_sort_sparse_grad_sorts_with_payload(self):
        rng = np.random.default_rng(9)
        ids = rng.integers(0, 50, size=200).astype(np.int32)
        vals = rng.normal(size=(200, 16)).astype(np.float32)
        sids, svals = jax.jit(sort_sparse_grad)(
            jnp.asarray(ids), jnp.asarray(vals)
        )
        sids, svals = np.asarray(sids), np.asarray(svals)
        assert (np.diff(sids) >= 0).all()
        # Multiset of (id, row) pairs preserved: compare summed scatter.
        np.testing.assert_allclose(
            np.asarray(_ref(np.zeros((50, 16), np.float32), sids, svals)),
            np.asarray(_ref(np.zeros((50, 16), np.float32), ids, vals)),
            rtol=1e-5, atol=1e-6,
        )

    def test_auto_unsorted_entry_point(self):
        rng = np.random.default_rng(10)
        R, D, U = 600, 16, 300
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = rng.integers(0, R, size=U).astype(np.int32)
        vals = rng.normal(size=(U, D)).astype(np.float32)
        out = stream_update_auto(
            jnp.asarray(table), jnp.asarray(ids), jnp.asarray(vals),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, ids, vals)),
            rtol=1e-5, atol=1e-5,
        )


class TestDmaRowUpdate:
    @pytest.mark.parametrize("R,D,U,cap,seed", [
        (1024, 128, 200, 256, 0), (640, 128, 600, 640, 1),
        (800, 128, 50, 64, 2),
        (1024, 16, 300, 512, 3),  # packed vrow: 8 rows per 128-lane DMA
        (4096, 16, 900, 1024, 4), (640, 64, 600, 640, 5),
        (512, 256, 60, 64, 6),  # wide rows: rpv=1
    ])
    def test_matches_scatter(self, R, D, U, cap, seed):
        rng = np.random.default_rng(seed)
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = np.unique(rng.integers(0, R, size=U).astype(np.int32))[:cap]
        uids = np.concatenate(
            [ids, R + np.arange(cap - ids.shape[0])]
        ).astype(np.int32)
        uvals = rng.normal(size=(cap, D)).astype(np.float32)
        out = dma_row_update(
            jnp.asarray(table), jnp.asarray(uids), jnp.asarray(uvals),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, uids, uvals)),
            rtol=1e-5, atol=1e-5,
        )

    def test_dense_runs_exercise_slot_recycling(self):
        # Consecutive ids make maximal same-vrow runs: exactly the case
        # where a lookahead read could clobber the active accumulation
        # buffer if slots were position-assigned.
        rng = np.random.default_rng(4)
        R, D = 512, 16
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = np.arange(0, 400, dtype=np.int32)
        uids = np.concatenate([ids, R + np.arange(112)]).astype(np.int32)
        uvals = rng.normal(size=(512, D)).astype(np.float32)
        out = dma_row_update(
            jnp.asarray(table), jnp.asarray(uids), jnp.asarray(uvals),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, uids, uvals)),
            rtol=1e-5, atol=1e-5,
        )

    def test_with_coalesce_output(self):
        rng = np.random.default_rng(5)
        R, D, B = 960, 128, 300
        table = rng.normal(size=(R, D)).astype(np.float32)
        ids = rng.integers(0, R, size=B).astype(np.int32)
        vals = rng.normal(size=(B, D)).astype(np.float32)
        uids, uvals = coalesce_sparse_grad(
            jnp.asarray(ids), jnp.asarray(vals), R, max_unique=B
        )
        out = dma_row_update(jnp.asarray(table), uids, uvals, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(table, ids, vals)),
            rtol=1e-4, atol=1e-4,
        )


class TestSparseStepStream:
    """TrainConfig.stream_update_max_rows wiring in the sparse SGD step:
    trajectory-identical to the scatter path (same dispatch pattern as
    tests/test_onehot_update.py::TestSparseStepOnehot)."""

    TINY = None  # built lazily to avoid import-order cost

    def _cfg(self):
        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            DLRMConfig,
        )

        return DLRMConfig(
            table_sizes=(100, 50, 10),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
        )

    @pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
    def test_trajectory_matches_scatter_path(self, monkeypatch, opt):
        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )

        monkeypatch.setenv("DQRM_STREAM_INTERPRET", "1")
        cfg = self._cfg()
        tc0 = TrainConfig(batch_size=32, learning_rate=0.1, optimizer=opt)
        # table 10 goes one-hot, 50 and 100 stream
        tc1 = tc0.replace(onehot_update_max_rows=16,
                          stream_update_max_rows=1000)
        s0 = init_train_state(cfg, tc0)
        s1 = init_train_state(cfg, tc1)
        step0 = make_train_step(cfg, tc0, sparse_emb_grad=True)
        step1 = make_train_step(cfg, tc1, sparse_emb_grad=True)
        rng = np.random.RandomState(0)
        for _ in range(4):
            b = random_batch(cfg, 32, rng)
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

    def test_qat_variable_pooling_masked(self, monkeypatch):
        import dataclasses

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            QuantConfig, TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )

        monkeypatch.setenv("DQRM_STREAM_INTERPRET", "1")
        cfg = dataclasses.replace(
            self._cfg(),
            pooling_size=3,
            quant=QuantConfig(enabled=True, scale_update_period=2),
        )
        tc0 = TrainConfig(batch_size=16, learning_rate=0.05)
        tc1 = tc0.replace(stream_update_max_rows=1000)  # all tables stream
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

    def test_learned_pooling_streams(self, monkeypatch):
        import dataclasses

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )

        monkeypatch.setenv("DQRM_STREAM_INTERPRET", "1")
        cfg = dataclasses.replace(
            self._cfg(), weighted_pooling="learned", pooling_size=2
        )
        tc0 = TrainConfig(batch_size=16, learning_rate=0.05)
        tc1 = tc0.replace(stream_update_max_rows=1000)
        s0 = init_train_state(cfg, tc0)
        s1 = init_train_state(cfg, tc1)
        step0 = make_train_step(cfg, tc0, sparse_emb_grad=True)
        step1 = make_train_step(cfg, tc1, sparse_emb_grad=True)
        rng = np.random.RandomState(3)
        for _ in range(3):
            b = random_batch(cfg, 16, rng)
            s0, _ = step0(s0, b)
            s1, _ = step1(s1, b)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )
        for a, c in zip(s0.params["v_W"], s1.params["v_W"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )


class TestSortedScatterSGD:
    def test_coalesced_sgd_branch_matches_plain(self, monkeypatch):
        """The batch-gated coalesce+hints SGD scatter (train_step.
        _SORTED_SCATTER_*) is trajectory-identical to the plain duplicate
        scatter; the gate constants are lowered so the B=32 test batch
        exercises the coalesced branch."""
        import deep_quantized_recommendation_model_dqrm_tpu.train_step as ts
        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )

        cfg = None
        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            DLRMConfig,
        )

        cfg = DLRMConfig(
            table_sizes=(100, 50, 10),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
        )
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s0 = ts.init_train_state(cfg, tc)
        s1 = ts.init_train_state(cfg, tc)
        step_plain = ts.make_train_step(cfg, tc, sparse_emb_grad=True)
        monkeypatch.setattr(ts, "_SORTED_SCATTER_MIN_UPDATES", 8)
        step_coal = ts.make_train_step(cfg, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(0)
        for _ in range(4):
            b = random_batch(cfg, 32, rng)
            s0, l0 = step_plain(s0, b)
            s1, l1 = step_coal(s1, b)
            assert np.isclose(float(l0), float(l1), rtol=1e-5)
        for a, c in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6
            )
