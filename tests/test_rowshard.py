"""Row-sharded mega-table parallelism (parallel/rowshard.py) on the 8-way
virtual CPU mesh: equivalence vs the single-chip step, giant-table spanning,
QAT scale correctness, eval parity."""

import dataclasses

import jax
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.parallel import make_mesh, rowshard
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


def qcfg(**kw) -> DLRMConfig:
    return dataclasses.replace(CFG, quant=QuantConfig(**kw))


class TestRowShard:
    def test_plan_spans_giant_table(self):
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)
        # the 500-row table is larger than one chunk => it spans devices,
        # the case table-granular sharding (hybrid.py) cannot express
        assert max(CFG.table_sizes) > plan.chunk
        assert plan.n_dev * plan.chunk >= sum(CFG.table_sizes) + 1

    def test_pack_unpack_roundtrip(self):
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)
        params = dlrm.init_params(CFG, seed=3)
        mega = rowshard.pack_rows(params["emb"], plan)
        back = rowshard.unpack_rows(mega, plan, CFG.table_sizes)
        for a, b in zip(back, params["emb"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_single_chip_fp32(self):
        """Row-sharded step must reproduce single-chip SGD exactly
        (uncompressed MLP grads)."""
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        rstep = rowshard.make_rowshard_train_step(CFG, tc, mesh, plan)

        sstate = init_train_state(CFG, tc)
        sstep = make_train_step(CFG, tc)

        rng = np.random.RandomState(11)
        for _ in range(3):
            b = random_batch(CFG, 64, rng)
            rstate, rloss = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(rloss), float(sloss), rtol=1e-4)
        back = rowshard.unpack_rows(rstate.mega, plan, CFG.table_sizes)
        for a, b_ in zip(back, sstate.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
        for da, sa in zip(rstate.mlp["bot"], sstate.params["bot"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-5
            )

    def test_qat_matches_single_chip(self):
        """Per-table scales via cross-device pmin/pmax must equal the
        single-chip whole-table scan; INT4 QAT trajectories agree."""
        cfg = qcfg(enabled=True, embedding_bit=4, weight_bit=4,
                   scale_update_period=2)
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(cfg.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(7)
        for _ in range(4):
            b = random_batch(cfg, 64, rng)
            rstate, rloss = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(rloss), float(sloss), rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(rstate.qstate.emb_scales),
            np.asarray(sstate.qstate.emb_scales),
            rtol=1e-6,
        )

    def test_eval_matches_single_chip(self):
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        ev = rowshard.make_rowshard_eval_step(CFG, mesh, plan)
        b = random_batch(CFG, 64, np.random.RandomState(5))
        probs = np.asarray(ev(rstate, b))
        params = dlrm.init_params(CFG, seed=tc.seed)
        ref = np.asarray(dlrm.predict(CFG, params, b))
        np.testing.assert_allclose(probs, ref, atol=1e-5)

    def test_megastep_matches_per_step(self):
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(CFG.table_sizes, 8)
        rng = np.random.RandomState(9)
        batches = [random_batch(CFG, 64, rng) for _ in range(4)]

        s1 = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        step1 = rowshard.make_rowshard_train_step(CFG, tc, mesh, plan)
        for b in batches:
            s1, l1 = step1(s1, b)
            jax.block_until_ready(s1)

        s2 = rowshard.init_rowshard_state(CFG, tc, mesh, plan)
        step2 = rowshard.make_rowshard_train_step(
            CFG, tc, mesh, plan, steps_per_dispatch=2
        )
        for i in range(0, 4, 2):
            s2, l2 = step2(s2, batches[i : i + 2])
            jax.block_until_ready(s2)
        assert np.isclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s1.mega), np.asarray(s2.mega), atol=1e-6
        )


class TestRowShardWeightedPooling:
    """Learned per-row pooling weights in the row-sharded engine: vw is
    sharded in the global row layout alongside the mega-table; analytic
    scalar gradients scatter into OWNED rows. Must match single-chip
    dense-autodiff SGD exactly with uncompressed MLP grads."""

    def _fresh_vw(self, cfg):
        rng = np.random.RandomState(0)
        vw_np = [
            rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
            for n in cfg.table_sizes
        ]
        return vw_np, lambda: [np.array(v) for v in vw_np]

    def test_learned_matches_single_chip(self):
        import jax.numpy as jnp

        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        vw_np, fresh = self._fresh_vw(cfg)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(cfg.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        rstate = rstate._replace(
            vw=rowshard.pack_rows_vw(
                [jnp.asarray(v) for v in fresh()], plan, mesh
            )
        )
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        sstep = make_train_step(cfg, tc)
        rng = np.random.RandomState(13)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            rstate, rl = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(rl), float(sl), rtol=1e-5)
        rv = rowshard.unpack_rows_vw(rstate.vw, plan, cfg.table_sizes)
        back = rowshard.unpack_rows(rstate.mega, plan, cfg.table_sizes)
        moved = 0.0
        for k in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(rv[k]), np.asarray(sstate.params["v_W"][k]), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(back[k]), np.asarray(sstate.params["emb"][k]), atol=1e-5
            )
            moved = max(
                moved,
                float(np.max(np.abs(np.asarray(sstate.params["v_W"][k]) - vw_np[k]))),
            )
        assert moved > 1e-6

    def test_eval_applies_vw(self):
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            make_eval_step,
        )

        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        _, fresh = self._fresh_vw(cfg)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(cfg.table_sizes, 8)
        rstate = rowshard.init_rowshard_state(cfg, TC, mesh, plan)
        rstate = rstate._replace(
            vw=rowshard.pack_rows_vw(
                [jnp.asarray(v) for v in fresh()], plan, mesh
            )
        )
        reval = rowshard.make_rowshard_eval_step(cfg, mesh, plan)
        sstate = init_train_state(cfg, TC)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        seval = make_eval_step(cfg)
        b = random_batch(cfg, 64, np.random.RandomState(15))
        np.testing.assert_allclose(
            np.asarray(reval(rstate, b)), np.asarray(seval(sstate, b)), atol=1e-5
        )
