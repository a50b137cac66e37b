"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py) — the JAX
analogue of the reference's pseudo-multi-GPU validation (SURVEY §4.5)."""

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
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
    comm_grad,
    hybrid,
    make_mesh,
)
from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import (
    get_my_slice,
    get_split_lengths,
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
TC = TrainConfig(batch_size=32, learning_rate=0.05, weight_sync_period=0)


def qcfg(**kw):
    return dataclasses.replace(CFG, quant=QuantConfig(**kw))


class TestSplitHelpers:
    def test_get_my_slice_matches_reference(self):
        # n=10 over 4 ranks: 3,3,2,2
        slices = [get_my_slice(10, 4, r) for r in range(4)]
        assert [s.stop - s.start for s in slices] == [3, 3, 2, 2]
        covered = sorted(sum([list(range(s.start, s.stop)) for s in slices], []))
        assert covered == list(range(10))

    def test_get_split_lengths(self):
        mx, splits = get_split_lengths(26, 8)
        assert splits == [4, 4, 3, 3, 3, 3, 3, 3]
        assert mx == 4 and sum(splits) == 26


class TestDPCommGrad:
    def _run(self, cfg, tc, n_steps=4, grad_bits=8):
        tc = tc.replace(grad_quant_bits=grad_bits)
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(cfg, tc)
        step = comm_grad.make_dp_train_step(cfg, tc, mesh)
        rng = np.random.RandomState(7)
        losses = []
        for _ in range(n_steps):
            b = random_batch(cfg, 64, rng)
            state, loss = step(state, b)
            losses.append(float(loss))
        return state, losses

    def test_fp32_grads_match_single_chip(self):
        """With grad_bits=32 (no compression) DP must equal one-chip training
        on the same global batch."""
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        dstate = comm_grad.init_dp_state(CFG, tc)
        dstep = comm_grad.make_dp_train_step(CFG, tc, mesh)

        sstate = init_train_state(CFG, tc)
        sstep = make_train_step(CFG, tc)

        rng = np.random.RandomState(3)
        for _ in range(3):
            b = random_batch(CFG, 64, rng)
            dstate, dloss = dstep(dstate, b)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(dloss), float(sloss), rtol=1e-4)
        for a, b_ in zip(dstate.params["emb"], sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        for da, sa in zip(dstate.params["top"], sstate.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-5
            )

    def test_onehot_update_matches_scatter_path(self):
        """TrainConfig.onehot_update_max_rows swaps the table scatter for the
        MXU one-hot dense grad — trajectory-identical in the dp engine."""
        s0, l0 = self._run(CFG, TC, grad_bits=8)
        s1, l1 = self._run(
            CFG, TC.replace(onehot_update_max_rows=10**6), grad_bits=8
        )
        np.testing.assert_allclose(l0, l1, rtol=1e-5)
        for a, b_ in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_stream_update_matches_scatter_path(self, monkeypatch):
        """TrainConfig.stream_update_max_rows swaps the dp apply scatter for
        the tile-streaming kernel (re-sorting the gathered concat of
        per-shard segments) — trajectory-identical."""
        monkeypatch.setenv("DQRM_STREAM_INTERPRET", "1")
        s0, l0 = self._run(CFG, TC, grad_bits=8)
        s1, l1 = self._run(
            CFG, TC.replace(stream_update_max_rows=10**6), grad_bits=8
        )
        np.testing.assert_allclose(l0, l1, rtol=1e-5)
        for a, b_ in zip(s0.params["emb"], s1.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_int8_compressed_close_to_fp32(self):
        _, l8 = self._run(CFG, TC, grad_bits=8)
        _, l32 = self._run(CFG, TC, grad_bits=32)
        # INT8 gradient compression tracks the uncompressed trajectory
        assert abs(l8[-1] - l32[-1]) < 0.05

    def test_loss_decreases_int8_qat(self):
        cfg = qcfg(enabled=True, scale_update_period=2)
        state, losses = self._run(cfg, TC, n_steps=10, grad_bits=8)
        assert losses[-1] < losses[0] + 0.05
        assert int(state.qstate.step) == 10

    def test_error_compensation_state_updates(self):
        tc = TC.replace(error_compensation=True)
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, tc)
        step = comm_grad.make_dp_train_step(CFG, tc, mesh)
        b = random_batch(CFG, 64, np.random.RandomState(1))
        state, _ = step(state, b)
        ec_norm = sum(
            float(jnp.sum(jnp.abs(l["w"]))) for l in state.ec["top"]
        )
        assert ec_norm > 0.0  # residuals captured

    def test_weight_sync_preserves_replicated_params(self):
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, TC)
        step = comm_grad.make_dp_train_step(CFG, TC, mesh)
        sync = comm_grad.make_weight_sync(mesh)
        rng = np.random.RandomState(2)
        for i in range(4):
            state, _ = step(state, random_batch(CFG, 64, rng))
            jax.block_until_ready(state)
            if (i + 1) % 2 == 0:
                before = np.asarray(state.params["emb"][0])
                state = sync(state)
                jax.block_until_ready(state)
                # replicas are identical here, so sync is a no-op mean
                np.testing.assert_allclose(
                    np.asarray(state.params["emb"][0]), before, rtol=1e-6
                )
        assert np.all(np.isfinite(np.asarray(state.params["emb"][0])))


class TestTableShardingPlan:
    def test_plan_covers_all_tables(self):
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 4)
        assert sorted(plan.local_ids[plan.local_ids >= 0].tolist()) == [0, 1, 2, 3, 4]
        # perm maps each table to a unique a2a slot
        assert len(set(plan.perm.tolist())) == 5

    def test_greedy_balances_rows(self):
        sizes = (1000, 10, 10, 10, 1000, 10, 10, 10)
        plan = hybrid.plan_table_sharding(sizes, 2)
        r0 = sum(sizes[k] for k in plan.local_ids[0] if k >= 0)
        r1 = sum(sizes[k] for k in plan.local_ids[1] if k >= 0)
        assert abs(r0 - r1) <= 20  # contiguous split would be 1030 vs 1030? no: 1030/1030 — use greedy check

    def test_pack_unpack_roundtrip(self):
        params = dlrm.init_params(CFG, seed=0)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 4)
        mega = hybrid.pack_tables(params["emb"], plan)
        back = hybrid.unpack_tables(mega, plan, CFG.table_sizes)
        for a, b in zip(params["emb"], back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHybrid:
    def test_hybrid_matches_single_chip_fp32(self):
        """Hybrid MP-emb + DP-MLP step must reproduce single-chip SGD
        (uncompressed gradients)."""
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)

        sstate = init_train_state(CFG, tc)
        sstep = make_train_step(CFG, tc)

        rng = np.random.RandomState(11)
        for _ in range(3):
            b = random_batch(CFG, 64, rng)
            hstate, hloss = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(hloss), float(sloss), rtol=1e-4), (
                float(hloss),
                float(sloss),
            )
        back = hybrid.unpack_tables(hstate.mega, plan, CFG.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        for da, sa in zip(hstate.mlp["bot"], sstate.params["bot"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-5
            )

    def test_hybrid_int8_mlp_grads_track_fp32(self):
        rng = np.random.RandomState(21)
        batches = [random_batch(CFG, 64, rng) for _ in range(3)]

        def run(bits):
            tc = TC.replace(grad_quant_bits=bits)
            mesh = make_mesh(8)
            plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
            st = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
            step = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)
            for b in batches:
                st, _ = step(st, b)
                jax.block_until_ready(st)
            return st

        s8, s32 = run(8), run(32)
        for a, b_ in zip(s8.mlp["top"], s32.mlp["top"]):
            assert float(np.max(np.abs(np.asarray(a["w"] - b_["w"])))) < 0.01

    def test_hybrid_qat_runs_and_scales_propagate(self):
        cfg = qcfg(enabled=True, scale_update_period=1, quantize_mlp=False)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, TC, mesh, plan)
        b = random_batch(cfg, 64, np.random.RandomState(5))
        hstate, loss = hstep(hstate, b)
        assert np.isfinite(float(loss))
        scales = np.asarray(hstate.qstate.emb_scales)
        assert np.all(scales > 0) and not np.allclose(scales, 1.0)

    def test_hybrid_qat_scales_match_single_chip(self):
        """Sharded per-slot scale computation == per-table table_scale."""
        cfg = qcfg(enabled=True, scale_update_period=1)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        params = dlrm.init_params(cfg, seed=0)
        hstate = hybrid.HybridState(
            mega=hybrid.pack_tables(params["emb"], plan, mesh),
            mlp={k: v for k, v in params.items() if k != "emb"},
            qstate=dlrm.init_quant_state(cfg),
        )
        hstep = hybrid.make_hybrid_train_step(cfg, TC, mesh, plan)
        b = random_batch(cfg, 64, np.random.RandomState(5))
        hstate, _ = hstep(hstate, b)
        expect = np.asarray(dlrm.compute_emb_scales(cfg, params))
        np.testing.assert_allclose(
            np.asarray(hstate.qstate.emb_scales), expect, rtol=1e-6
        )


class TestSchemeEngines:
    """PACT/LSQ quant schemes through the distributed engines.

    PACT through dp (uncompressed) must reproduce single-chip trajectories
    EXACTLY (identity STE: row grads are pure scatters, weight grads plain).
    LSQ through dp/hybrid is ALSO exactly batch-size-invariant since round
    3: the engines pass lsq_numel_scale=n_dev so each shard's learned-step
    gradient scale is 1/sqrt(GLOBAL_numel*Qp) (quant.fake_quant_lsq), and
    the pmean of per-shard grads then equals the single-chip grad by
    linearity of the loss mean. (torch DDP of LsqQuan uses the LOCAL numel
    and only TRACKS — documented in PARITY.md.) The row-sharded engines
    must REJECT PACT (weight-side emb quant happens before the gather the
    mega-table engines bypass)."""

    def _run_pair(self, cfg, make_dist_state, make_dist_step, loss_rtol,
                  n_steps=3):
        tc = TC.replace(grad_quant_bits=32)
        dstate = make_dist_state(cfg, tc)
        dstep = make_dist_step(cfg, tc)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(17)
        for _ in range(n_steps):
            b = random_batch(cfg, 64, rng)
            dstate, dloss = dstep(dstate, b)
            jax.block_until_ready(dstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(dloss), float(sloss), rtol=loss_rtol), (
                float(dloss), float(sloss),
            )
        return dstate, sstate

    def test_pact_dp_matches_single_chip_exactly(self):
        cfg = qcfg(enabled=True, quant_scheme="pact", scale_update_period=2)
        mesh = make_mesh(8)
        dstate, sstate = self._run_pair(
            cfg,
            comm_grad.init_dp_state,
            lambda c, t: comm_grad.make_dp_train_step(c, t, mesh),
            loss_rtol=1e-4,
        )
        for a, b_ in zip(dstate.params["emb"], sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_lsq_dp_matches_single_chip_exactly(self):
        cfg = qcfg(enabled=True, quant_scheme="lsq", scale_update_period=2)
        mesh = make_mesh(8)
        dstate, sstate = self._run_pair(
            cfg,
            comm_grad.init_dp_state,
            lambda c, t: comm_grad.make_dp_train_step(c, t, mesh),
            loss_rtol=1e-5,
        )
        for a, b_ in zip(dstate.params["emb"], sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        # learned steps land on the single-chip trajectory exactly
        for a, b_ in zip(dstate.params["lsq_emb"], sstate.params["lsq_emb"]):
            np.testing.assert_allclose(float(a), float(b_), atol=1e-7)
        for pa, pb in zip(
            dstate.params["lsq_mlp"]["top"], sstate.params["lsq_mlp"]["top"]
        ):
            np.testing.assert_allclose(
                np.asarray(pa["w"]), np.asarray(pb["w"]), atol=1e-6
            )

    def test_lsq_hybrid_matches_single_chip_exactly(self):
        cfg = qcfg(enabled=True, quant_scheme="lsq", scale_update_period=2)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        dstate, sstate = self._run_pair(
            cfg,
            lambda c, t: hybrid.init_hybrid_state(c, t, mesh, plan),
            lambda c, t: hybrid.make_hybrid_train_step(c, t, mesh, plan),
            loss_rtol=1e-4,
        )
        back = hybrid.unpack_tables(dstate.mega, plan, cfg.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        for a, b_ in zip(dstate.mlp["lsq_emb"], sstate.params["lsq_emb"]):
            np.testing.assert_allclose(float(a), float(b_), atol=5e-7)

    def test_pact_hybrid_matches_single_chip_exactly(self):
        """Round 5 closes the last engine carve-out: PACT's per-table
        DoReFa weight fake-quant runs over the mega block via a segment
        max (quant.fake_quant_pact_segmented — numerically identical to
        per-table normalization), and the identity STE makes the raw-block
        scatter update exact, so hybrid == single chip."""
        cfg = qcfg(enabled=True, quant_scheme="pact", scale_update_period=2)
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(19)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            hstate, hl = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(hl), float(sl), rtol=1e-4)
        back = hybrid.unpack_tables(hstate.mega, plan, cfg.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_pact_rowshard_matches_single_chip_exactly(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            rowshard,
        )

        cfg = qcfg(enabled=True, quant_scheme="pact", scale_update_period=2)
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        rplan = rowshard.plan_row_sharding(cfg.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, rplan)
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, rplan)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(29)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            rstate, rl = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(rl), float(sl), rtol=1e-4)
        back = rowshard.unpack_rows(rstate.mega, rplan, cfg.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_pact_eval_matches_single_chip(self):
        cfg = qcfg(enabled=True, quant_scheme="pact", scale_update_period=2)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        ev = hybrid.make_hybrid_eval_step(cfg, mesh, plan)
        sstate = init_train_state(cfg, TC)
        b = random_batch(cfg, 64, np.random.RandomState(31))
        np.testing.assert_allclose(
            np.asarray(ev(hstate, b)),
            np.asarray(dlrm.predict(cfg, sstate.params, b, sstate.qstate)),
            atol=1e-5,
        )

    def test_pact_learned_vw_still_rejected_by_mega_engines(self):
        cfg = dataclasses.replace(
            qcfg(enabled=True, quant_scheme="pact", scale_update_period=2),
            weighted_pooling="learned",
        )
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        with pytest.raises(NotImplementedError, match="pact"):
            hybrid.make_hybrid_train_step(cfg, TC, mesh, plan)


class TestNoSyncDP:
    def test_replicas_drift_without_sync(self):
        """Local-SGD ablation: no grad sync => per-device replicas diverge;
        a weight_sync re-averages them (dp_only.py semantics)."""
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, TC)
        step = comm_grad.make_dp_nosync_train_step(CFG, TC, mesh)
        rng = np.random.RandomState(13)
        for _ in range(3):
            state, loss = step(state, random_batch(CFG, 64, rng))
            jax.block_until_ready(state)
        assert np.isfinite(float(loss))
        # per-device shards of the "replicated" params now differ
        w = state.params["top"][0]["w"]
        shards = [np.asarray(s.data) for s in w.addressable_shards]
        assert not np.allclose(shards[0], shards[1])
        # weight sync re-averages
        state = comm_grad.make_weight_sync(mesh)(state)
        jax.block_until_ready(state)
        w2 = state.params["top"][0]["w"]
        shards2 = [np.asarray(s.data) for s in w2.addressable_shards]
        np.testing.assert_allclose(shards2[0], shards2[1], rtol=1e-6)


class TestFreezeRanges:
    def test_frozen_act_ranges_stay_constant(self):
        cfg = qcfg(enabled=True, quantize_activation=True, scale_update_period=1)
        params = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, params, dlrm.init_quant_state(cfg))
        b1 = random_batch(cfg, 32, np.random.RandomState(1))
        b2 = random_batch(cfg, 32, np.random.RandomState(2))
        _, qs1 = dlrm.forward(cfg, params, b1, qs, train=True)
        frozen = dlrm.freeze_ranges(qs1)
        _, qs2 = dlrm.forward(cfg, params, b2, frozen, train=True)
        np.testing.assert_allclose(
            np.asarray(qs2.act_min), np.asarray(qs1.act_min)
        )
        un = dlrm.unfreeze_ranges(qs2)
        _, qs3 = dlrm.forward(cfg, params, b2, un, train=True)
        assert not np.allclose(np.asarray(qs3.act_max), np.asarray(qs1.act_max))


class TestCollectiveProbe:
    def test_probe_all_ok_on_mesh(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.probe import (
            probe_collectives,
        )

        res = probe_collectives(make_mesh(8))
        assert res["ok"], res


class TestCompressedA2A:
    def test_int8_a2a_close_to_exact(self):
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from deep_quantized_recommendation_model_dqrm_tpu.parallel.compressed_a2a import (
            compressed_all_to_all,
        )

        mesh = make_mesh(8)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, size=(8, 16, 4)).astype(np.float32))

        def exact(xs):
            return jax.lax.all_to_all(xs, "mp", split_axis=1, concat_axis=0, tiled=True)

        def comp(xs):
            return compressed_all_to_all(xs, "mp", 8, 1, 0)

        f_e = jax.jit(shard_map(exact, mesh=mesh, in_specs=(P("mp"),),
                                out_specs=P("mp"), check_vma=False))
        f_c = jax.jit(shard_map(comp, mesh=mesh, in_specs=(P("mp"),),
                                out_specs=P("mp"), check_vma=False))
        ye = np.asarray(f_e(x))
        jax.block_until_ready(ye)
        yc = np.asarray(f_c(x))
        assert ye.shape == yc.shape
        assert np.max(np.abs(ye - yc)) < 1.0 / 127 + 1e-6  # one int8 step

    def test_hybrid_with_compressed_a2a_tracks_exact(self):
        rng = np.random.RandomState(31)
        batches = [random_batch(CFG, 64, rng) for _ in range(3)]

        def run(bits):
            tc = TC.replace(a2a_quant_bits=bits, grad_quant_bits=32)
            mesh = make_mesh(8)
            plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
            st = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
            step = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)
            losses = []
            for b in batches:
                st, l = step(st, b)
                jax.block_until_ready(st)
                losses.append(float(l))
            return losses

        l8 = run(8)
        l32 = run(32)
        assert abs(l8[-1] - l32[-1]) < 0.02, (l8, l32)


class TestInt4GradExchange:
    def test_int4_packed_grads_train(self):
        tc = TC.replace(grad_quant_bits=4)
        mesh = make_mesh(8)
        state = comm_grad.init_dp_state(CFG, tc)
        step = comm_grad.make_dp_train_step(CFG, tc, mesh)
        rng = np.random.RandomState(17)
        losses = []
        for _ in range(6):
            state, loss = step(state, random_batch(CFG, 64, rng))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] + 0.1  # INT4 grads still train

    def test_int4_vs_int8_grad_trajectories_close(self):
        rng = np.random.RandomState(18)
        batches = [random_batch(CFG, 64, rng) for _ in range(4)]

        def run(bits):
            tc = TC.replace(grad_quant_bits=bits)
            mesh = make_mesh(8)
            st = comm_grad.init_dp_state(CFG, tc)
            step = comm_grad.make_dp_train_step(CFG, tc, mesh)
            for b in batches:
                st, l = step(st, b)
                jax.block_until_ready(st)
            return float(l)

        l4, l8 = run(4), run(8)
        assert abs(l4 - l8) < 0.05


class TestHybridMask:
    def test_hybrid_with_variable_pooling_mask(self):
        import dataclasses

        cfg = dataclasses.replace(CFG, pooling_size=3)
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan, has_mask=True)

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )

        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(41)
        for _ in range(2):
            b = random_batch(cfg, 64, rng, variable_pooling=True)
            hstate, hloss = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(hloss), float(sloss), rtol=1e-4)
        back = hybrid.unpack_tables(hstate.mega, plan, cfg.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


class TestCoalescedExchange:
    """The compressed sparse exchange coalesces duplicates BEFORE quantizing
    (reference order: .coalesce() -> scale -> quantize,
    sgd_quantized_gradients_parallel_comm.py:850-866)."""

    def test_coalesce_sparse_grad_dedups_and_pads(self):
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            coalesce_sparse_grad,
        )

        ids = jnp.asarray([3, 1, 3, 0, 1, 3], jnp.int32)
        vals = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        uids, uvals = coalesce_sparse_grad(ids, vals, num_rows=5, max_unique=5)
        # scatter both forms into a dense table: must agree exactly
        dense_raw = np.zeros((5, 2), np.float32)
        np.add.at(dense_raw, np.asarray(ids), np.asarray(vals))
        dense_co = np.zeros((6, 2), np.float32)  # row 5 catches the padding
        np.add.at(dense_co, np.minimum(np.asarray(uids), 5), np.asarray(uvals))
        np.testing.assert_allclose(dense_co[:5], dense_raw)
        # 3 unique ids -> 2 padded slots with DISTINCT out-of-range ids
        u = np.asarray(uids)
        assert int(np.sum(u >= 5)) == 2 and len(np.unique(u[u >= 5])) == 2
        # the whole padded list is strictly ascending and duplicate-free,
        # the invariant that legalizes unique_indices/indices_are_sorted
        # scatter hints downstream (train_step.py sparse optimizer paths)
        assert np.all(np.diff(u) > 0)

    def test_bf16_scatter_no_fulltable_f32_convert(self):
        """Regression for the round-4 Terabyte OOM: scaling a bf16-cast
        scatter update by the f32 lr promoted it back to f32, so XLA
        wrapped the bf16 table scatter in a FULL-TABLE f32 convert
        (4.8 GB temp on a 10M-row table). The lowered HLO of a bf16 dp
        step must not materialize any f32 tensor of the big table's
        shape."""
        cfg = dataclasses.replace(
            CFG, table_sizes=(50000, 64, 32), table_dtype="bfloat16",
            # 3 tables -> dot interaction dim (4 choose 2) + bot_out 8 = 14
            mlp_top=(14, 32, 1),
        )
        tc = TC.replace(grad_quant_bits=8, onehot_update_max_rows=1000)
        mesh = make_mesh(1)
        state = comm_grad.init_dp_state(cfg, tc)
        step = comm_grad.make_dp_train_step(cfg, tc, mesh)
        batch = random_batch(cfg, 32, np.random.RandomState(0))
        hlo = step.lower(state, batch).as_text()  # StableHLO text
        assert "tensor<50000x8xbf16>" in hlo  # the table is there, bf16
        assert "tensor<50000x8xf32>" not in hlo, (
            "full-table f32 temp found — a scatter update is being "
            "promoted to f32 (cast AFTER scaling, see comm_grad)"
        )
        # same bug class in the mega-table engines (hybrid + rowshard):
        # their whole block must stay bf16 through the scatter update
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            rowshard,
        )

        mesh8 = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh8, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh8, plan)
        hhlo = hstep.lower(
            hstate, random_batch(cfg, 32, np.random.RandomState(1))
        ).as_text()
        rows = plan.n_dev * plan.block_rows
        assert f"tensor<{rows}x8xbf16>" in hhlo
        # neither the global mega nor a per-device block may promote
        assert f"tensor<{rows}x8xf32>" not in hhlo, "hybrid mega promoted"
        assert (
            f"tensor<{plan.block_rows}x8xf32>" not in hhlo
        ), "hybrid per-device block promoted"
        rplan = rowshard.plan_row_sharding(cfg.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh8, rplan)
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh8, rplan)
        rhlo = rstep.lower(
            rstate, random_batch(cfg, 32, np.random.RandomState(1))
        ).as_text()
        rrows = rplan.n_dev * rplan.chunk
        assert f"tensor<{rrows}x8xbf16>" in rhlo
        assert f"tensor<{rrows}x8xf32>" not in rhlo, "rowshard mega promoted"
        assert (
            f"tensor<{rplan.chunk}x8xf32>" not in rhlo
        ), "rowshard per-device chunk promoted"

    def test_batched_mlp_psum_bit_identical(self):
        """compressed_psum_batched == per-tensor compressed_psum_dense
        BIT-for-bit on a real 8-device mesh (concat commutes with the
        elementwise scale pmean and the exact int32 psum — round 4)."""
        from jax.sharding import PartitionSpec as P

        from deep_quantized_recommendation_model_dqrm_tpu.parallel.comm_grad import (
            compressed_psum_batched,
            compressed_psum_dense,
        )

        rng = np.random.RandomState(7)
        shapes = [(32, 16), (32,), (8, 32), (8,)]
        pcs = [True, False, True, False]
        gs = [jnp.asarray(rng.randn(8, *s).astype(np.float32)) for s in shapes]

        mesh = make_mesh(8)

        def per_tensor(*args):
            return tuple(
                compressed_psum_dense(g, 8, "mp", per_channel=pc)
                for g, pc in zip(args, pcs)
            )

        def batched(*args):
            return tuple(compressed_psum_batched(list(args), 8, "mp", pcs))

        specs = tuple(P("mp") for _ in gs)
        out_specs = tuple(P() for _ in gs)
        f1 = jax.jit(jax.shard_map(
            per_tensor, mesh=mesh, in_specs=specs, out_specs=out_specs,
            check_vma=False))
        r1 = f1(*gs)
        jax.block_until_ready(r1)
        f2 = jax.jit(jax.shard_map(
            batched, mesh=mesh, in_specs=specs, out_specs=out_specs,
            check_vma=False))
        r2 = f2(*gs)
        jax.block_until_ready(r2)
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_batched_coalesce_matches_per_table(self):
        """coalesce_sparse_grads_batched == per-table coalesce_sparse_grad
        for every table: same sums, same strictly-ascending duplicate-free
        id invariant, per-table padding base num_rows[t] (round 4 — the dp
        engine's one-batched-pass replacement for 26 per-table sorts)."""
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            coalesce_sparse_grad,
            coalesce_sparse_grads_batched,
        )

        rng = np.random.RandomState(3)
        num_rows = [5, 100, 2, 17]
        K = 12
        ids = jnp.asarray(
            np.stack([rng.randint(0, n, size=K) for n in num_rows]), jnp.int32
        )
        vals = jnp.asarray(rng.randn(4, K, 3).astype(np.float32))
        buids, buvals = coalesce_sparse_grads_batched(
            ids, vals, jnp.asarray(num_rows, jnp.int32), K
        )
        for t, n in enumerate(num_rows):
            uids, uvals = coalesce_sparse_grad(ids[t], vals[t], n, K)
            np.testing.assert_array_equal(np.asarray(buids[t]), np.asarray(uids))
            np.testing.assert_allclose(
                np.asarray(buvals[t]), np.asarray(uvals), atol=1e-6
            )
            u = np.asarray(buids[t])
            assert np.all(np.diff(u) > 0)  # hints stay legal

    def test_sum_then_quantize_recovers_underflowing_duplicates(self):
        """Duplicated tiny gradients that individually round to 0 on the int
        grid must survive the exchange via their coalesced sum — the numerics
        reason the reference coalesces first."""
        from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            coalesce_sparse_grad,
        )

        bits = 8
        # one big row grad (sets the scale) + 64 duplicates of a tiny one
        big = 1.0
        tiny = 0.003  # < scale/2 = 1/254: quantizes to 0 alone
        ids = jnp.asarray([0] + [1] * 64, jnp.int32)
        vals = jnp.concatenate(
            [jnp.full((1, 4), big), jnp.full((64, 4), tiny)]
        ).astype(jnp.float32)
        scale = q.symmetric_quantization_params(bits, jnp.min(vals), jnp.max(vals))
        # old (wrong) order: quantize each row then sum duplicates -> row 1 lost
        lost = q.dequantize(q.quantize(vals[1:], scale, bits), scale).sum(0)
        assert float(np.max(np.abs(np.asarray(lost)))) == 0.0
        # new order: coalesce first; the summed row survives quantization
        uids, uvals = coalesce_sparse_grad(ids, vals, num_rows=4, max_unique=4)
        s2 = q.symmetric_quantization_params(bits, jnp.min(uvals), jnp.max(uvals))
        kept = q.dequantize(q.quantize(uvals, s2, bits), s2)
        row1 = np.asarray(kept)[np.asarray(uids) == 1][0]
        np.testing.assert_allclose(row1, 64 * tiny, rtol=0.05)

    def test_dp_int8_tiny_table_matches_uncompressed(self):
        """Heavy-duplicate regime (table smaller than the batch): compressed
        training must still track fp32 closely now that sums are quantized."""
        cfg = dataclasses.replace(CFG, table_sizes=(3, 5, 7, 64, 200))
        rng = np.random.RandomState(23)
        batches = [random_batch(cfg, 64, rng) for _ in range(4)]

        def run(bits):
            tc = TC.replace(grad_quant_bits=bits)
            mesh = make_mesh(8)
            st = comm_grad.init_dp_state(cfg, tc)
            step = comm_grad.make_dp_train_step(cfg, tc, mesh)
            for b in batches:
                st, l = step(st, b)
                jax.block_until_ready(st)
            return st, float(l)

        s8, l8 = run(8)
        s32, l32 = run(32)
        assert abs(l8 - l32) < 0.05
        for a, b_ in zip(s8.params["emb"][:3], s32.params["emb"][:3]):
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(b_)))) < 0.05


class TestMultihostHelpers:
    def test_local_batch_slice_single_host(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.multihost import (
            init_distributed,
            local_batch_slice,
        )

        rank, count = init_distributed()
        assert (rank, count) == (0, 1)  # single-process environment
        start, size = local_batch_slice(128)
        assert (start, size) == (0, 128)


class TestHybridEval:
    def test_sharded_eval_matches_single_chip(self):
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)
        b = random_batch(CFG, 64, np.random.RandomState(51))
        hstate, _ = hstep(hstate, b)
        jax.block_until_ready(hstate)

        ev = hybrid.make_hybrid_eval_step(CFG, mesh, plan)
        b2 = random_batch(CFG, 64, np.random.RandomState(52))
        p_sharded = np.asarray(ev(hstate, b2))
        jax.block_until_ready(p_sharded)

        back = {
            **hstate.mlp,
            "emb": hybrid.unpack_tables(hstate.mega, plan, CFG.table_sizes),
        }
        p_single = np.asarray(dlrm.predict(CFG, back, b2, hstate.qstate))
        np.testing.assert_allclose(p_sharded, p_single, rtol=1e-5, atol=1e-6)


class TestMultihostTwoProcess:
    @pytest.mark.slow
    def test_two_process_distributed_smoke(self):
        """2-process jax.distributed CPU run: init_distributed's env-var
        path, a global mesh spanning both processes, and a compressed-grad
        DP step with both ranks agreeing on the loss (scripts/
        multihost_smoke.py; the reference analogue is the launcher env
        handling of extend_distributed.py:74-132)."""
        import subprocess
        import sys

        import os as _os
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, _os.path.join(repo, "scripts", "multihost_smoke.py")],
            capture_output=True,
            timeout=400,
            env={**_os.environ, "SMOKE_PORT": "12421"},
        )
        out = r.stdout.decode()
        assert r.returncode == 0, out + r.stderr.decode()
        assert "MULTIHOST SMOKE OK" in out, out


class TestMultihostCLI:
    @pytest.mark.slow
    def test_two_process_cli_run(self):
        """The FULL train.py driver as a real 2-process jax.distributed
        launch (scripts/multihost_cli_smoke.py): init_distributed env
        discovery, per-host batch slices sewn into global arrays
        (train.globalize_batch), dp compressed-grad training + sharded
        eval — the reference's mp.spawn driver launch
        (dlrm_s_pytorch_comm_grad.py:1159-1168)."""
        import subprocess
        import sys

        import os as _os
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable,
             _os.path.join(repo, "scripts", "multihost_cli_smoke.py")],
            capture_output=True,
            timeout=400,
            env={**_os.environ, "SMOKE_PORT": "12561"},
        )
        out = r.stdout.decode()
        assert r.returncode == 0, out + r.stderr.decode()
        assert "MULTIHOST CLI SMOKE OK" in out, out


class TestInt4A2A:
    def test_int4_packed_a2a_close_to_exact(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from deep_quantized_recommendation_model_dqrm_tpu.parallel.compressed_a2a import (
            compressed_all_to_all,
        )

        mesh = make_mesh(8)
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(-1, 1, size=(8, 16, 4)).astype(np.float32))

        def exact(xs):
            return jax.lax.all_to_all(xs, "mp", split_axis=1, concat_axis=0, tiled=True)

        def comp4(xs):
            return compressed_all_to_all(xs, "mp", 4, 1, 0)

        f_e = jax.jit(shard_map(exact, mesh=mesh, in_specs=(P("mp"),),
                                out_specs=P("mp"), check_vma=False))
        f_c = jax.jit(shard_map(comp4, mesh=mesh, in_specs=(P("mp"),),
                                out_specs=P("mp"), check_vma=False))
        ye = np.asarray(f_e(x))
        jax.block_until_ready(ye)
        yc = np.asarray(f_c(x))
        assert ye.shape == yc.shape
        assert np.max(np.abs(ye - yc)) < 1.0 / 7 + 1e-6  # one int4 step

    def test_hybrid_trains_with_int4_a2a(self):
        rng = np.random.RandomState(33)
        batches = [random_batch(CFG, 64, rng) for _ in range(3)]
        tc = TC.replace(a2a_quant_bits=4, grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
        st = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
        step = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)
        losses = []
        for b in batches:
            st, l = step(st, b)
            jax.block_until_ready(st)
            losses.append(float(l))
        assert all(np.isfinite(losses)), losses

    def test_a2a_volume_report_halves_at_int4(self):
        from deep_quantized_recommendation_model_dqrm_tpu.tools.analysis import (
            a2a_volume_report,
        )

        r8 = a2a_volume_report(4, 128, 16, world_size=4, a2a_bits=8)
        r4 = a2a_volume_report(4, 128, 16, world_size=4, a2a_bits=4)
        assert abs(r8["compressed_bytes"] / r4["compressed_bytes"] - 2.0) < 0.01
        assert r4["reduction"] > 7.9  # ~8x vs fp32


class TestDistributedMegastep:
    def test_dp_multi_matches_singles(self):
        rng = np.random.RandomState(61)
        batches = [random_batch(CFG, 64, rng) for _ in range(4)]
        tc = TC.replace(grad_quant_bits=8)
        mesh = make_mesh(8)

        s1 = comm_grad.init_dp_state(CFG, tc)
        step1 = comm_grad.make_dp_train_step(CFG, tc, mesh)
        for b in batches:
            s1, l1 = step1(s1, b)
        jax.block_until_ready(s1)

        s2 = comm_grad.init_dp_state(CFG, tc)
        step2 = comm_grad.make_dp_train_step(CFG, tc, mesh, steps_per_dispatch=2)
        s2, _ = step2(s2, batches[:2])
        jax.block_until_ready(s2)
        s2, l2 = step2(s2, batches[2:])
        jax.block_until_ready(s2)

        assert float(l1) == float(l2)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_dp_scan_matches_unrolled(self):
        """The scan-in-shard_map megastep (round-4: O(1) compile in k)
        equals the k-times-unrolled body bit-for-bit."""
        rng = np.random.RandomState(63)
        batches = [random_batch(CFG, 64, rng) for _ in range(4)]
        tc = TC.replace(grad_quant_bits=8)
        mesh = make_mesh(8)

        s1 = comm_grad.init_dp_state(CFG, tc)
        step1 = comm_grad.make_dp_train_step(
            CFG, tc, mesh, steps_per_dispatch=4, use_scan=False
        )
        s1, l1 = step1(s1, batches)
        jax.block_until_ready(s1)

        s2 = comm_grad.init_dp_state(CFG, tc)
        step2 = comm_grad.make_dp_train_step(
            CFG, tc, mesh, steps_per_dispatch=4, use_scan=True
        )
        s2, l2 = step2(s2, batches)
        jax.block_until_ready(s2)

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-7
            )
        # stacked-Batch input is the same dispatch (one upload per field)
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            stack_batches,
        )

        s3 = comm_grad.init_dp_state(CFG, tc)
        s3, l3 = step2(s3, stack_batches(batches))
        jax.block_until_ready(s3)
        np.testing.assert_allclose(float(l2), float(l3), rtol=1e-6)

    def test_rowshard_scan_matches_unrolled(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            rowshard,
        )

        rng = np.random.RandomState(64)
        batches = [random_batch(CFG, 64, rng) for _ in range(2)]
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)

        s1 = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        step1 = rowshard.make_rowshard_train_step(
            CFG, tc, mesh, plan, steps_per_dispatch=2, use_scan=False
        )
        s1, l1 = step1(s1, batches)
        jax.block_until_ready(s1)

        s2 = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        step2 = rowshard.make_rowshard_train_step(
            CFG, tc, mesh, plan, steps_per_dispatch=2, use_scan=True
        )
        s2, l2 = step2(s2, batches)
        jax.block_until_ready(s2)

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s1.mega), np.asarray(s2.mega), atol=1e-7
        )

    def test_hybrid_multi_matches_singles(self):
        rng = np.random.RandomState(62)
        batches = [random_batch(CFG, 64, rng) for _ in range(4)]
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)

        s1 = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
        step1 = hybrid.make_hybrid_train_step(CFG, tc, mesh, plan)
        for b in batches:
            s1, l1 = step1(s1, b)
        jax.block_until_ready(s1)

        s2 = hybrid.init_hybrid_state(CFG, tc, mesh, plan)
        step2 = hybrid.make_hybrid_train_step(
            CFG, tc, mesh, plan, steps_per_dispatch=2
        )
        s2, _ = step2(s2, batches[:2])
        jax.block_until_ready(s2)
        s2, l2 = step2(s2, batches[2:])
        jax.block_until_ready(s2)

        assert float(l1) == float(l2)
        np.testing.assert_array_equal(np.asarray(s1.mega), np.asarray(s2.mega))


class TestWeightedPooling:
    """Learned per-row pooling weights (upstream --weighted-pooling=learned,
    dlrm_s_pytorch.py:417-448) in the distributed engines: the sparse-cut
    steps carry analytic v_W gradients, so with uncompressed gradients they
    must reproduce single-chip dense-autodiff SGD exactly."""

    def _states(self, cfg, tc):
        rng0 = np.random.RandomState(0)
        vw_np = [
            rng0.uniform(0.5, 1.5, (n,)).astype(np.float32)
            for n in cfg.table_sizes
        ]

        def fresh():
            # donation invalidates shared buffers — every engine gets copies
            return [jnp.asarray(v) for v in vw_np]

        return vw_np, fresh

    def test_dp_learned_matches_single_chip(self):
        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        vw_np, fresh = self._states(cfg, tc)
        mesh = make_mesh(8)
        dstate = comm_grad.init_dp_state(cfg, tc)
        dstate = dstate._replace(
            params={**dstate.params, "v_W": fresh()}
        )
        dstep = comm_grad.make_dp_train_step(cfg, tc, mesh)
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(3)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            dstate, dl = dstep(dstate, b)
            jax.block_until_ready(dstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(dl), float(sl), rtol=1e-5)
        for k in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(dstate.params["v_W"][k]),
                np.asarray(sstate.params["v_W"][k]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(dstate.params["emb"][k]),
                np.asarray(sstate.params["emb"][k]),
                atol=1e-5,
            )
        # v_W actually trains (non-trivial gradients reached it)
        moved = max(
            float(np.max(np.abs(np.asarray(sstate.params["v_W"][k]) - vw_np[k])))
            for k in range(cfg.num_tables)
        )
        assert moved > 1e-6

    def test_dp_learned_qat_matches_single_chip(self):
        cfg = dataclasses.replace(
            qcfg(enabled=True, scale_update_period=2), weighted_pooling="learned"
        )
        tc = TC.replace(grad_quant_bits=32)
        _, fresh = self._states(cfg, tc)
        mesh = make_mesh(8)
        dstate = comm_grad.init_dp_state(cfg, tc)
        dstate = dstate._replace(params={**dstate.params, "v_W": fresh()})
        dstep = comm_grad.make_dp_train_step(cfg, tc, mesh)
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(5)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            dstate, dl = dstep(dstate, b)
            jax.block_until_ready(dstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(dl), float(sl), rtol=1e-5)
        for k in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(dstate.params["v_W"][k]),
                np.asarray(sstate.params["v_W"][k]),
                atol=1e-5,
            )

    def test_hybrid_learned_matches_single_chip(self):
        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        vw_np, fresh = self._states(cfg, tc)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstate = hstate._replace(vw=hybrid.pack_vw(fresh(), plan, mesh))
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(7)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            hstate, hl = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(hl), float(sl), rtol=1e-5)
        hv = hybrid.unpack_vw(hstate.vw, plan, cfg.table_sizes)
        back = hybrid.unpack_tables(hstate.mega, plan, cfg.table_sizes)
        for k in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(hv[k]),
                np.asarray(sstate.params["v_W"][k]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(back[k]),
                np.asarray(sstate.params["emb"][k]),
                atol=1e-5,
            )

    def test_hybrid_eval_applies_vw(self):
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            make_eval_step,
        )

        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        _, fresh = self._states(cfg, tc)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstate = hstate._replace(vw=hybrid.pack_vw(fresh(), plan, mesh))
        heval = hybrid.make_hybrid_eval_step(cfg, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        seval = make_eval_step(cfg)
        b = random_batch(cfg, 64, np.random.RandomState(9))
        hp = np.asarray(heval(hstate, b))
        sp = np.asarray(seval(sstate, b))
        np.testing.assert_allclose(hp, sp, atol=1e-5)

    def test_dp_learned_int8_tracks_uncompressed(self):
        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        _, fresh = self._states(cfg, TC)

        def run(bits):
            tc = TC.replace(grad_quant_bits=bits)
            mesh = make_mesh(8)
            st = comm_grad.init_dp_state(cfg, tc)
            st = st._replace(params={**st.params, "v_W": fresh()})
            step = comm_grad.make_dp_train_step(cfg, tc, mesh)
            rng = np.random.RandomState(11)
            loss = None
            for _ in range(4):
                st, loss = step(st, random_batch(cfg, 64, rng))
                jax.block_until_ready(st)
            return float(loss)

        assert abs(run(8) - run(32)) < 0.05

    def test_hybrid_learned_with_tricks_supported(self):
        # round 5 (VERDICT r4 #6): the combination is no longer rejected —
        # trick v_W replicates next to the trick tables as mlp["vw_trick"].
        # Exact-equivalence coverage:
        # test_tricks_parallel.py::TestLearnedVwWithTricks.
        cfg = dataclasses.replace(
            CFG, weighted_pooling="learned", qr_flag=True, qr_threshold=100
        )
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(
            cfg.table_sizes,
            8,
            kinds=tuple(cfg.table_kind(k) for k in range(cfg.num_tables)),
        )
        hstate = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        assert "vw_trick" in hstate.mlp and hstate.vw is not None

    def test_sparse_single_chip_step_supports_learned(self):
        # round 3: the sparse step carries analytic sparse v_W grads (no
        # dense-autodiff fallback); exact-equivalence coverage lives in
        # tests/test_model.py::TestSparseStepTricks
        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        step = make_train_step(cfg, TC, sparse_emb_grad=True)
        assert step is not None


class TestHybridPinnedLayout:
    def test_pin_mega_layout_matches_unpinned(self):
        """pin_mega_layout=True (row-major mega in/out layouts, the
        Terabyte-scale relayout fix — see comm_grad._pin_format) must be
        numerically identical to the default step."""
        cfg = CFG
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        s1 = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        s2 = hybrid.pin_mega_state(
            hybrid.init_hybrid_state(cfg, tc, mesh, plan), mesh
        )
        st1 = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
        st2 = hybrid.make_hybrid_train_step(
            cfg, tc, mesh, plan, pin_mega_layout=True
        )
        rng = np.random.RandomState(3)
        for _ in range(2):
            b = random_batch(cfg, 64, rng)
            s1, l1 = st1(s1, b)
            jax.block_until_ready(s1)
            s2, l2 = st2(s2, b)
            jax.block_until_ready(s2)
            assert float(l1) == float(l2)
        np.testing.assert_allclose(
            np.asarray(s1.mega), np.asarray(s2.mega), atol=1e-6
        )

    def test_pin_scan_megastep(self):
        cfg = CFG
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        s2 = hybrid.pin_mega_state(
            hybrid.init_hybrid_state(cfg, tc, mesh, plan), mesh
        )
        st2 = hybrid.make_hybrid_train_step(
            cfg, tc, mesh, plan, steps_per_dispatch=2, pin_mega_layout=True
        )
        rng = np.random.RandomState(5)
        s2, l2 = st2(s2, [random_batch(cfg, 64, rng) for _ in range(2)])
        assert np.isfinite(float(l2))
