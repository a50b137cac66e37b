"""Tests: pseudo-multi-worker simulation + ranking-range mixed-bit policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
    comm_grad,
    make_mesh,
    pseudo,
    ranking_range,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_train_step,
)

CFG = DLRMConfig(
    table_sizes=(64, 200, 30, 500, 7),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(23, 8, 1),
)
TC = TrainConfig(batch_size=64, learning_rate=0.05, weight_sync_period=0)


class TestPseudoMultiWorker:
    def test_fp32_matches_single_chip(self):
        """N simulated workers with 32-bit buffers == one full-batch step."""
        tc = TC.replace(grad_quant_bits=32)
        ps = pseudo.init_pseudo_state(CFG, tc)
        pstep = pseudo.make_pseudo_train_step(CFG, tc, num_workers=4)
        ss = init_train_state(CFG, tc)
        sstep = make_train_step(CFG, tc)
        rng = np.random.RandomState(0)
        for _ in range(3):
            b = random_batch(CFG, 64, rng)
            ps, ploss = pstep(ps, b)
            ss, sloss = sstep(ss, b)
        for a, b_ in zip(ps.params["emb"], ss.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
        for da, sa in zip(ps.params["top"], ss.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=2e-5
            )

    def test_int8_buffers_track_fp32(self):
        tc8 = TC.replace(grad_quant_bits=8)
        tc32 = TC.replace(grad_quant_bits=32)
        rng = np.random.RandomState(1)
        batches = [random_batch(CFG, 64, rng) for _ in range(5)]
        s8 = pseudo.init_pseudo_state(CFG, tc8)
        st8 = pseudo.make_pseudo_train_step(CFG, tc8, 4)
        s32 = pseudo.init_pseudo_state(CFG, tc32)
        st32 = pseudo.make_pseudo_train_step(CFG, tc32, 4)
        for b in batches:
            s8, l8 = st8(s8, b)
            s32, l32 = st32(s32, b)
        # trajectories stay close under int8 buffer quantization
        for a, b_ in zip(s8.params["top"], s32.params["top"]):
            assert float(jnp.max(jnp.abs(a["w"] - b_["w"]))) < 0.01

    def test_pseudo_matches_dp_comm_grad_int8_closely(self):
        """The simulation validates the distributed algorithm (its purpose
        in the reference): pseudo-N and real mesh-N trajectories agree."""
        tc = TC.replace(grad_quant_bits=8)
        mesh = make_mesh(8)
        ds = comm_grad.init_dp_state(CFG, tc)
        dstep = comm_grad.make_dp_train_step(CFG, tc, mesh)
        ps = pseudo.init_pseudo_state(CFG, tc)
        pstep = pseudo.make_pseudo_train_step(CFG, tc, 8)
        rng = np.random.RandomState(2)
        for _ in range(3):
            b = random_batch(CFG, 64, rng)
            ds, dl = dstep(ds, b)
            jax.block_until_ready(ds)
            ps, plv = pstep(ps, b)
        for a, b_ in zip(ps.params["top"], ds.params["top"]):
            assert float(jnp.max(jnp.abs(a["w"] - b_["w"]))) < 0.02

    def test_qat_pseudo_runs(self):
        import dataclasses

        cfg = dataclasses.replace(
            CFG, quant=QuantConfig(enabled=True, scale_update_period=2)
        )
        ps = pseudo.init_pseudo_state(cfg, TC)
        pstep = pseudo.make_pseudo_train_step(cfg, TC, 4)
        b = random_batch(cfg, 64, np.random.RandomState(3))
        ps, loss = pstep(ps, b)
        assert np.isfinite(float(loss))
        assert int(ps.qstate.step) == 1

    def test_weighted_pooling_fixed_carries_v_w(self):
        """Regression: the apply must carry non-emb/bot/top param keys
        (v_W) through, or step 2 crashes with KeyError in lookup_all."""
        import dataclasses

        cfg = dataclasses.replace(CFG, weighted_pooling="fixed")
        ps = pseudo.init_pseudo_state(cfg, TC)
        pstep = pseudo.make_pseudo_train_step(cfg, TC, 4)
        rng = np.random.RandomState(5)
        for _ in range(2):
            ps, loss = pstep(ps, random_batch(cfg, 64, rng))
        assert "v_W" in ps.params
        assert np.isfinite(float(loss))

    def test_learned_pooling_and_qr_rejected(self):
        import dataclasses

        import pytest

        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        with pytest.raises(NotImplementedError, match="weighted_pooling"):
            pseudo.make_pseudo_train_step(cfg, TC, 4)
        cfg = dataclasses.replace(CFG, qr_flag=True, qr_threshold=8)
        with pytest.raises(NotImplementedError, match="QR/MD"):
            pseudo.make_pseudo_train_step(cfg, TC, 4)


class TestRankingRange:
    def test_assignment_fractions(self):
        ranges = jnp.asarray(np.random.RandomState(0).rand(26).astype(np.float32))
        ws = jnp.ones(26)
        modes = ranking_range.assign_bit_widths(
            ranges, ws, jnp.int32(7), frac_hi=0.2, frac_int8=0.3
        )
        m = np.asarray(modes)
        assert (m == ranking_range.HI).sum() == round(0.2 * 26)
        assert (m == ranking_range.INT8).sum() == round(0.3 * 26)
        assert (m == ranking_range.SKIP).sum() == 26 - round(0.2 * 26) - round(0.3 * 26)

    def test_assignment_deterministic_per_step(self):
        ranges = jnp.asarray(np.random.RandomState(1).rand(10).astype(np.float32))
        ws = jnp.ones(10)
        a = ranking_range.assign_bit_widths(ranges, ws, jnp.int32(5))
        b = ranking_range.assign_bit_widths(ranges, ws, jnp.int32(5))
        c = ranking_range.assign_bit_widths(ranges, ws, jnp.int32(6))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_high_range_tables_favored(self):
        # one table with overwhelming range should essentially always get HI
        ranges = jnp.asarray([1e6, 1.0, 1.0, 1.0, 1.0] * 2, jnp.float32)
        ws = jnp.ones(10)
        hits = 0
        for s in range(20):
            m = np.asarray(ranking_range.assign_bit_widths(ranges, ws, jnp.int32(s)))
            hits += m[0] == ranking_range.HI or m[5] == ranking_range.HI
        assert hits >= 18

    def test_two_channel_roundtrip(self):
        rng = np.random.RandomState(2)
        vals = jnp.asarray(rng.normal(0, 0.1, size=(16, 8)).astype(np.float32))
        s = ranking_range.grad_scale_int16(jnp.max(jnp.abs(vals)))
        # HI mode: int16 precision
        enc = ranking_range.encode_two_channel(vals, s, jnp.int32(ranking_range.HI))
        dec = ranking_range.decode_two_channel(enc, s, jnp.int32(ranking_range.HI))
        assert float(jnp.max(jnp.abs(dec - vals))) <= float(s) * 0.51
        # INT8 mode: coarser (hi byte only) but unbiased-ish
        enc8 = ranking_range.encode_two_channel(vals, s, jnp.int32(ranking_range.INT8))
        dec8 = ranking_range.decode_two_channel(enc8, s, jnp.int32(ranking_range.INT8))
        assert float(jnp.max(jnp.abs(dec8 - vals))) <= float(s) * 257
        # SKIP: zero
        encs = ranking_range.encode_two_channel(vals, s, jnp.int32(ranking_range.SKIP))
        decs = ranking_range.decode_two_channel(encs, s, jnp.int32(ranking_range.SKIP))
        assert float(jnp.max(jnp.abs(decs))) == 0.0

    def test_dp_step_with_ranking_range(self):
        tc = TC.replace(ranking_range=True)
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, tc)
        step = comm_grad.make_dp_train_step(CFG, tc, mesh)
        rng = np.random.RandomState(4)
        losses = []
        for _ in range(6):
            state, loss = step(state, random_batch(CFG, 64, rng))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        # training still progresses despite 50% skipped updates
        assert losses[-1] < losses[0] + 0.1
