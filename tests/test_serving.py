"""Serving/PTQ tests: export, size compression, accuracy vs fp32, engine."""

import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.serving import (
    ServingEngine,
    make_serving_fn,
    ptq_export,
    serving_model_bytes,
)

CFG = DLRMConfig(
    table_sizes=(512, 128, 64),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


@pytest.fixture(scope="module")
def trained():
    params = dlrm.init_params(CFG, seed=0)
    return params


class TestPTQExport:
    def test_model_size_8x(self, trained):
        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        fp32_bytes = sum(t.size * 4 for t in trained["emb"]) + sum(
            (l["w"].size + l["b"].size) * 4
            for part in ("bot", "top")
            for l in trained[part]
        )
        ratio = fp32_bytes / serving_model_bytes(sm)
        assert ratio > 6.0  # ~8x on tables, ~4x on MLP

    def test_serving_close_to_fp32(self, trained):
        b = random_batch(CFG, 64, np.random.RandomState(0))
        p_fp = np.asarray(dlrm.predict(CFG, trained, b))
        sm8 = ptq_export(CFG, trained, emb_bits=8, mlp_bits=8)
        p8 = np.asarray(make_serving_fn(sm8)(b))
        assert np.max(np.abs(p8 - p_fp)) < 0.06
        sm4 = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        p4 = np.asarray(make_serving_fn(sm4)(b))
        # INT4 PTQ is coarser but must stay correlated
        assert np.corrcoef(p4, p_fp)[0, 1] > 0.85

    def test_rowwise_close_to_symmetric(self, trained):
        b = random_batch(CFG, 32, np.random.RandomState(1))
        s_sym = np.asarray(make_serving_fn(ptq_export(CFG, trained, 4, 8))(b))
        s_row = np.asarray(
            make_serving_fn(ptq_export(CFG, trained, 4, 8, rowwise=True))(b)
        )
        assert np.corrcoef(s_sym, s_row)[0, 1] > 0.9

    def test_int8_mxu_mlp_close_to_xla_path(self, trained):
        """mlp_impl='int8' (dynamic activation quant + INT8 integer GEMM,
        torch quantize_dynamic execution model) must track the
        dequant-to-fp32 path closely."""
        b = random_batch(CFG, 64, np.random.RandomState(3))
        sm = ptq_export(CFG, trained, emb_bits=8, mlp_bits=8)
        p_xla = np.asarray(make_serving_fn(sm, mlp_impl="xla")(b))
        p_int8 = np.asarray(make_serving_fn(sm, mlp_impl="int8")(b))
        assert np.max(np.abs(p_int8 - p_xla)) < 0.05
        assert np.corrcoef(p_int8, p_xla)[0, 1] > 0.99

    def test_int8_linear_dynamic_matches_fp32(self):
        from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.quant_matmul import (
            int8_linear_dynamic,
            quantize_linear_weights,
        )

        rng = np.random.RandomState(0)
        w = rng.randn(32, 48).astype(np.float32) * 0.1
        bias = rng.randn(32).astype(np.float32) * 0.01
        x = rng.randn(16, 48).astype(np.float32)
        qw = quantize_linear_weights(w, bias, 8)
        y = np.asarray(int8_linear_dynamic(x, qw))
        y_ref = x @ w.T + bias
        # INT8 weights + INT8 activations: ~1% relative error budget
        assert np.max(np.abs(y - y_ref)) < 0.05 * np.max(np.abs(y_ref))

    def test_fp32_mlp_option(self, trained):
        sm = ptq_export(CFG, trained, emb_bits=8, mlp_bits=32)
        b = random_batch(CFG, 16, np.random.RandomState(2))
        p = np.asarray(make_serving_fn(sm)(b))
        assert p.shape == (16,) and np.all((p >= 0) & (p <= 1))


class TestServingEngine:
    def test_bucketing_and_padding(self, trained):
        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        eng = ServingEngine(sm, buckets=(16, 64))
        rng = np.random.RandomState(3)
        B = 50  # not a bucket size -> padded to 64
        dense = rng.rand(B, 4).astype(np.float32)
        idx = np.stack(
            [rng.randint(0, n, size=(B, 1)).astype(np.int32) for n in CFG.table_sizes]
        )
        out = eng.predict(dense, idx)
        assert out.shape == (B,)
        # same result as direct call (padding must not leak)
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch

        d64 = np.zeros((64, 4), np.float32); d64[:B] = dense
        i64 = np.zeros((3, 64, 1), np.int32); i64[:, :B] = idx
        direct = np.asarray(
            eng.fn(Batch(jnp.asarray(d64), jnp.asarray(i64), jnp.zeros(64), None))
        )[:B]
        np.testing.assert_allclose(out, direct, rtol=1e-6)

    def test_large_request_chunks(self, trained):
        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        eng = ServingEngine(sm, buckets=(32,))
        rng = np.random.RandomState(4)
        B = 100  # 4 chunks of <=32
        dense = rng.rand(B, 4).astype(np.float32)
        idx = np.stack(
            [rng.randint(0, n, size=(B, 1)).astype(np.int32) for n in CFG.table_sizes]
        )
        out = eng.predict(dense, idx)
        assert out.shape == (B,) and np.all(np.isfinite(out))


class TestMicroBatcher:
    def test_concurrent_requests_match_direct(self, trained):
        import threading

        from deep_quantized_recommendation_model_dqrm_tpu.serving import MicroBatcher

        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        eng = ServingEngine(sm, buckets=(16, 64))
        mb = MicroBatcher(eng, max_batch=64, max_wait_ms=5.0)
        rng = np.random.RandomState(5)
        reqs = []
        for _ in range(12):
            n = int(rng.randint(1, 7))
            dense = rng.rand(n, 4).astype(np.float32)
            idx = np.stack(
                [rng.randint(0, t, size=(n, 1)).astype(np.int32)
                 for t in CFG.table_sizes]
            )
            reqs.append((dense, idx))
        results = [None] * len(reqs)

        def client(i):
            results[i] = mb.predict(*reqs[i])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        mb.close()
        for (dense, idx), got in zip(reqs, results):
            direct = eng.predict(dense, idx)
            np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-6)

    def test_close_rejects_new_requests(self, trained):
        from deep_quantized_recommendation_model_dqrm_tpu.serving import MicroBatcher

        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        mb = MicroBatcher(ServingEngine(sm, buckets=(16,)), max_batch=16)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.predict(np.zeros((1, 4), np.float32), np.zeros((3, 1, 1), np.int32))


class TestExport:
    def test_stablehlo_roundtrip_exact(self, trained, tmp_path):
        import jax

        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.serving import (
            export_stablehlo,
            load_stablehlo,
        )

        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8)
        path = export_stablehlo(sm, 16, str(tmp_path / "m.bin"))
        fn = load_stablehlo(path)
        b = random_batch(CFG, 16, np.random.RandomState(5))
        out = np.asarray(fn(b.dense, b.indices))
        ref = np.asarray(make_serving_fn(sm)(b))
        np.testing.assert_allclose(out, ref, rtol=0, atol=0)


class TestTrickServing:
    """PTQ serving for QR/MD compositional tables + weighted pooling —
    beyond the reference, whose PTQ path only handles plain emb_l weights
    (dlrm_s_pytorch.py:457-474 would crash on QR/MD models)."""

    @staticmethod
    def _unpacked_params(params, sm):
        """params with every table replaced by its dequantized packed copy —
        the exact fp32 model the packed serving path should compute."""
        from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (
            unpack_table,
        )

        out = dict(params)
        emb = []
        for e in sm.emb:
            if isinstance(e, dict) and "q" in e:
                emb.append({"q": unpack_table(e["q"]), "r": unpack_table(e["r"])})
            elif isinstance(e, dict):
                d = {"table": unpack_table(e["table"])}
                if "proj" in e:
                    d["proj"] = e["proj"]
                emb.append(d)
            else:
                emb.append(unpack_table(e))
        out["emb"] = emb
        return out

    @pytest.mark.parametrize("op", ["mult", "add", "concat"])
    def test_qr_serving_matches_unpacked_forward(self, op):
        cfg = DLRMConfig(
            table_sizes=(512, 300, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            qr_flag=True,
            qr_collisions=4,
            qr_threshold=200,
            qr_operation=op,
        )
        params = dlrm.init_params(cfg, seed=0)
        assert isinstance(params["emb"][0], dict)  # 512 > threshold -> QR
        sm = ptq_export(cfg, params, emb_bits=8, mlp_bits=32)
        b = random_batch(cfg, 32, np.random.RandomState(0))
        got = np.asarray(make_serving_fn(sm)(b))
        want = np.asarray(dlrm.predict(cfg, self._unpacked_params(params, sm), b))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_md_serving_matches_unpacked_forward(self):
        cfg = DLRMConfig(
            table_sizes=(512, 300, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            md_flag=True,
            md_threshold=200,
        )
        params = dlrm.init_params(cfg, seed=0)
        assert isinstance(params["emb"][0], dict)
        sm = ptq_export(cfg, params, emb_bits=8, mlp_bits=32)
        b = random_batch(cfg, 32, np.random.RandomState(1))
        got = np.asarray(make_serving_fn(sm)(b))
        want = np.asarray(dlrm.predict(cfg, self._unpacked_params(params, sm), b))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_weighted_pooling_served(self):
        """v_W rides along fp32 and is applied as per-sample weights."""
        cfg = DLRMConfig(
            table_sizes=(512, 128, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            weighted_pooling="learned",
            pooling_size=3,
        )
        params = dlrm.init_params(cfg, seed=0)
        rng = np.random.RandomState(7)
        params["v_W"] = [
            np.asarray(rng.uniform(0.5, 1.5, v.shape), np.float32)
            for v in params["v_W"]
        ]
        sm = ptq_export(cfg, params, emb_bits=8, mlp_bits=32)
        assert sm.vw is not None
        b = random_batch(cfg, 32, rng)
        got = np.asarray(make_serving_fn(sm)(b))
        want = np.asarray(dlrm.predict(cfg, self._unpacked_params(params, sm), b))
        np.testing.assert_allclose(got, want, atol=2e-5)
        # non-trivial weights must actually change the output
        ones = dict(params)
        ones["v_W"] = [np.ones_like(v) for v in params["v_W"]]
        p_ones = np.asarray(
            dlrm.predict(cfg, self._unpacked_params(ones, ptq_export(cfg, ones, 8, 32)), b)
        )
        assert np.max(np.abs(p_ones - got)) > 1e-4

    def test_qr_int4_stays_correlated(self):
        cfg = DLRMConfig(
            table_sizes=(512, 300, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            qr_flag=True,
            qr_threshold=200,
        )
        params = dlrm.init_params(cfg, seed=2)
        b = random_batch(cfg, 64, np.random.RandomState(3))
        p_fp = np.asarray(dlrm.predict(cfg, params, b))
        p4 = np.asarray(make_serving_fn(ptq_export(cfg, params, 4, 8))(b))
        assert np.corrcoef(p4, p_fp)[0, 1] > 0.85

    def test_qr_model_bytes_below_dense(self):
        dense_cfg = DLRMConfig(
            table_sizes=(4096, 4096, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
        )
        qr_cfg = DLRMConfig(
            table_sizes=(4096, 4096, 64),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            qr_flag=True,
            qr_collisions=8,
            qr_threshold=200,
        )
        sm_dense = ptq_export(dense_cfg, dlrm.init_params(dense_cfg, 0), 4, 8)
        sm_qr = ptq_export(qr_cfg, dlrm.init_params(qr_cfg, 0), 4, 8)
        assert serving_model_bytes(sm_qr) < serving_model_bytes(sm_dense) / 3


class TestOnehotServingLookup:
    def test_onehot_lookup_exact_vs_gather(self, trained, monkeypatch):
        """onehot_lookup_max_rows swaps small-table packed gathers for the
        MXU one-hot kernel — predictions identical (the unpacked table the
        kernel consumes is the same dequantized values the gather path
        produces)."""
        monkeypatch.setenv("DQRM_ONEHOT_INTERPRET", "1")
        b = random_batch(CFG, 32, np.random.RandomState(5))
        for bits in (4, 8):
            sm = ptq_export(CFG, trained, emb_bits=bits, mlp_bits=8)
            p0 = np.asarray(make_serving_fn(sm)(b))
            p1 = np.asarray(
                make_serving_fn(sm, onehot_lookup_max_rows=600)(b)
            )
            np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-6)

    def test_partial_threshold_only_converts_small_tables(self, trained,
                                                          monkeypatch):
        monkeypatch.setenv("DQRM_ONEHOT_INTERPRET", "1")
        b = random_batch(CFG, 16, np.random.RandomState(6))
        sm = ptq_export(CFG, trained, emb_bits=8, mlp_bits=8)
        p0 = np.asarray(make_serving_fn(sm)(b))
        # threshold 128 covers tables 128 and 64 but not 512
        p1 = np.asarray(make_serving_fn(sm, onehot_lookup_max_rows=128)(b))
        np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-6)

    def test_rowwise_tables_take_onehot_path_too(self, trained, monkeypatch):
        monkeypatch.setenv("DQRM_ONEHOT_INTERPRET", "1")
        b = random_batch(CFG, 16, np.random.RandomState(7))
        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8, rowwise=True)
        p0 = np.asarray(make_serving_fn(sm)(b))
        p1 = np.asarray(make_serving_fn(sm, onehot_lookup_max_rows=600)(b))
        np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-6)


class TestFusedGather:
    """fused_gather=True: one mega-gather over all symmetric packed tables
    (round 5 serving optimization) must be numerically identical to the
    per-table gather path."""

    def test_fused_gather_matches(self, trained):
        b = random_batch(CFG, 64, np.random.RandomState(7))
        for bits in (4, 8):
            sm = ptq_export(CFG, trained, emb_bits=bits, mlp_bits=8)
            p_ref = np.asarray(make_serving_fn(sm)(b))
            p_fused = np.asarray(make_serving_fn(sm, fused_gather=True)(b))
            np.testing.assert_allclose(p_fused, p_ref, atol=1e-6)

    def test_fused_gather_with_vw_and_mask(self):
        import dataclasses

        cfg = dataclasses.replace(CFG, weighted_pooling="fixed")
        params = dlrm.init_params(cfg, seed=1)
        rng = np.random.RandomState(0)
        params["v_W"] = [
            rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
            for n in cfg.table_sizes
        ]
        b = random_batch(cfg, 32, np.random.RandomState(9))
        sm = ptq_export(cfg, params, emb_bits=4, mlp_bits=8)
        p_ref = np.asarray(make_serving_fn(sm)(b))
        p_fused = np.asarray(make_serving_fn(sm, fused_gather=True)(b))
        np.testing.assert_allclose(p_fused, p_ref, atol=1e-6)

    def test_fused_gather_rowwise_falls_back(self, trained):
        # rowwise (asymmetric per-row) tables are ineligible; the fused flag
        # must silently fall back to the per-table path and stay exact
        b = random_batch(CFG, 32, np.random.RandomState(11))
        sm = ptq_export(CFG, trained, emb_bits=4, mlp_bits=8, rowwise=True)
        p_ref = np.asarray(make_serving_fn(sm)(b))
        p_fused = np.asarray(make_serving_fn(sm, fused_gather=True)(b))
        np.testing.assert_allclose(p_fused, p_ref, atol=1e-6)
