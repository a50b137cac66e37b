"""QR/MD compositional embeddings in the distributed engines.

The reference supports QR/MD tables in every forward mode of the upstream
driver (create_emb dispatch dlrm_s_pytorch.py:239-286 feeds sequential_,
parallel_ AND distributed_forward). Here: the hybrid step carries trick
tables REPLICATED next to the MLPs (plan ranks them -1; gradients ride the
DDP pmean channel), and the compressed-grad DP step routes their dense tiny
gradients through the same INT psum as the MLP weights. Both must reproduce
the single-chip dense-autodiff trajectory exactly when uncompressed.
"""

import dataclasses

import jax
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
    hybrid,
    make_mesh,
)
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_train_step,
)

# Tables 500 and 700 exceed the threshold -> become QR/MD; the rest stay
# dense, so the mega-table packing and the trick handling coexist.
QR_CFG = DLRMConfig(
    table_sizes=(64, 500, 30, 700, 7),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(23, 8, 1),
    qr_flag=True,
    qr_threshold=200,
    qr_collisions=4,
)
MD_CFG = dataclasses.replace(
    QR_CFG, qr_flag=False, md_flag=True, md_threshold=200, md_temperature=0.3
)
TC = TrainConfig(batch_size=32, learning_rate=0.05, weight_sync_period=0)


def _kinds(cfg):
    return tuple(cfg.table_kind(k) for k in range(cfg.num_tables))


class TestPlanWithTricks:
    def test_trick_tables_excluded_from_mega(self):
        plan = hybrid.plan_table_sharding(QR_CFG.table_sizes, 4, kinds=_kinds(QR_CFG))
        assert plan.table_rank[1] == -1 and plan.table_rank[3] == -1
        assert plan.perm[1] == -1 and plan.perm[3] == -1
        placed = set(plan.local_ids.ravel().tolist()) - {-1}
        assert placed == {0, 2, 4}
        # dense rows only: 64+30+7 split over 4 devices + pad
        assert plan.block_rows <= 64 + 1

    def test_pack_unpack_skip_tricks(self):
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        params = dlrm.init_params(QR_CFG, seed=3)
        plan = hybrid.plan_table_sharding(QR_CFG.table_sizes, 4, kinds=_kinds(QR_CFG))
        mega = hybrid.pack_tables(params["emb"], plan)
        back = hybrid.unpack_tables(mega, plan, QR_CFG.table_sizes)
        assert back[1] is None and back[3] is None
        for k in (0, 2, 4):
            np.testing.assert_array_equal(np.asarray(params["emb"][k]), np.asarray(back[k]))


class TestHybridTricks:
    @pytest.mark.parametrize("cfg", [QR_CFG, MD_CFG], ids=["qr", "md"])
    def test_hybrid_matches_single_chip_fp32(self, cfg):
        """Uncompressed hybrid step with QR/MD tables == single-chip
        dense-autodiff SGD (losses + final params)."""
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8, kinds=_kinds(cfg))
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)

        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc, sparse_emb_grad=False)

        rng = np.random.RandomState(17)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            hstate, hloss = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(hloss), float(sloss), rtol=1e-4)

        # dense tables from the mega-table
        back = hybrid.unpack_tables(hstate.mega, plan, cfg.table_sizes)
        for k in range(cfg.num_tables):
            if cfg.table_kind(k) == "dense":
                np.testing.assert_allclose(
                    np.asarray(back[k]),
                    np.asarray(sstate.params["emb"][k]),
                    atol=1e-5,
                )
            else:
                for leaf, ref in zip(
                    jax.tree_util.tree_leaves(hstate.mlp["emb_trick"][str(k)]),
                    jax.tree_util.tree_leaves(sstate.params["emb"][k]),
                ):
                    np.testing.assert_allclose(
                        np.asarray(leaf), np.asarray(ref), atol=1e-5
                    )

    def test_hybrid_eval_matches_single_chip(self):
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(QR_CFG.table_sizes, 8, kinds=_kinds(QR_CFG))
        hstate = hybrid.init_hybrid_state(QR_CFG, tc, mesh, plan)
        ev = hybrid.make_hybrid_eval_step(QR_CFG, mesh, plan)
        sstate = init_train_state(QR_CFG, tc)

        b = random_batch(QR_CFG, 64, np.random.RandomState(5))
        probs = np.asarray(ev(hstate, b))
        ref = np.asarray(
            jax.nn.sigmoid(
                dlrm.forward(
                    QR_CFG, sstate.params, b, sstate.qstate, train=False
                )[0]
            )
        )
        np.testing.assert_allclose(probs, ref, atol=1e-5)

    def test_hybrid_qat_with_qr_runs(self):
        """Dense tables fake-quantized, QR tables stay full-precision —
        the step compiles and the loss stays finite."""
        cfg = dataclasses.replace(
            QR_CFG, quant=QuantConfig(enabled=True, embedding_bit=4,
                                      scale_update_period=2)
        )
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8, kinds=_kinds(cfg))
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
        rng = np.random.RandomState(1)
        for _ in range(3):
            hstate, loss = hstep(hstate, random_batch(cfg, 64, rng))
        assert np.isfinite(float(loss))


class TestDPTricks:
    @pytest.mark.parametrize("cfg", [QR_CFG, MD_CFG], ids=["qr", "md"])
    def test_dp_uncompressed_matches_single_chip(self, cfg):
        tc = TC.replace(grad_quant_bits=32)
        mesh = make_mesh(8)
        dstate = comm_grad.init_dp_state(cfg, tc)
        dstep = comm_grad.make_dp_train_step(cfg, tc, mesh)

        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc, sparse_emb_grad=False)

        rng = np.random.RandomState(23)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            dstate, dloss = dstep(dstate, b)
            jax.block_until_ready(dstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(dloss), float(sloss), rtol=1e-4)

        for k in range(cfg.num_tables):
            for leaf, ref in zip(
                jax.tree_util.tree_leaves(dstate.params["emb"][k]),
                jax.tree_util.tree_leaves(sstate.params["emb"][k]),
            ):
                np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref), atol=1e-5)

    def test_dp_int8_tracks_uncompressed(self):
        """INT8-compressed trick-table grads stay close to the fp32 path."""
        mesh = make_mesh(8)
        rng = np.random.RandomState(31)
        batches = [random_batch(QR_CFG, 64, rng) for _ in range(4)]

        def run(bits):
            tc = TC.replace(grad_quant_bits=bits)
            st = comm_grad.init_dp_state(QR_CFG, tc)
            step = comm_grad.make_dp_train_step(QR_CFG, tc, mesh)
            losses = []
            for b in batches:
                st, l = step(st, b)
                losses.append(float(l))
            return losses, st

        l8, st8 = run(8)
        l32, st32 = run(32)
        np.testing.assert_allclose(l8, l32, atol=2e-2)
        q8 = np.asarray(st8.params["emb"][1]["q"])
        q32 = np.asarray(st32.params["emb"][1]["q"])
        np.testing.assert_allclose(q8, q32, atol=2e-2)
        # compression actually changed something (grads were quantized)
        assert not np.array_equal(q8, q32)

    def test_dp_ranking_range_with_tricks(self):
        """ranking_range governs the sparse exchange of DENSE tables; QR/MD
        tables stay on the dense psum channel — the combination trains."""
        tc = TC.replace(ranking_range=True)
        mesh = make_mesh(8)
        dstate = comm_grad.init_dp_state(QR_CFG, tc)
        dstep = comm_grad.make_dp_train_step(QR_CFG, tc, mesh)
        rng = np.random.RandomState(7)
        q0 = np.asarray(dstate.params["emb"][1]["q"]).copy()
        t0 = np.asarray(dstate.params["emb"][0]).copy()
        for _ in range(4):
            dstate, loss = dstep(dstate, random_batch(QR_CFG, 64, rng))
        assert np.isfinite(float(loss))
        # trick tables trained via the psum channel; dense tables via the
        # mixed-bit sparse exchange (over 4 steps every tier fires at least
        # once for some table)
        assert not np.array_equal(q0, np.asarray(dstate.params["emb"][1]["q"]))
        assert not np.array_equal(t0, np.asarray(dstate.params["emb"][0]))


class TestAllTrickTables:
    """Edge: EVERY table is QR (qr_threshold below the smallest table) +
    learned pooling — the batched learned-vw exchange has NO dense tables
    (vw_uniq/vw_ks empty; round-4 guard), all v_W grads ride the trick
    recompute."""

    def _cfg(self):
        return dataclasses.replace(
            QR_CFG, qr_threshold=5, weighted_pooling="learned"
        )

    def test_single_chip_sparse_step(self):
        cfg = self._cfg()
        state = init_train_state(cfg, TC)
        step = make_train_step(cfg, TC, sparse_emb_grad=True)
        batch = random_batch(cfg, 32, np.random.RandomState(0))
        state, loss = step(state, batch)
        jax.block_until_ready(state)
        assert np.isfinite(float(loss))

    def test_dp_step(self):
        mesh = make_mesh(8)
        cfg = self._cfg()
        tc = TC.replace(grad_quant_bits=8)
        dstate = comm_grad.init_dp_state(cfg, tc)
        dstep = comm_grad.make_dp_train_step(cfg, tc, mesh)
        batch = random_batch(cfg, 32, np.random.RandomState(0))
        dstate, loss = dstep(dstate, batch)
        jax.block_until_ready(dstate)
        assert np.isfinite(float(loss))


class TestReviewFixes:
    def test_random_batch_dedupes_bags(self):
        """Duplicate draws inside a bag get mask 0 (the reference's
        per-bag np.unique, dlrm_data_pytorch.py:1140-1148)."""
        cfg = dataclasses.replace(QR_CFG, qr_flag=False, table_sizes=(3, 3, 3, 3, 3))
        b = random_batch(cfg, 32, np.random.RandomState(0), num_indices_per_lookup=4)
        assert b.mask is not None
        idx = np.asarray(b.indices)
        m = np.asarray(b.mask)
        for t in range(idx.shape[0]):
            for i in range(idx.shape[1]):
                kept = idx[t, i][m[t, i] > 0]
                assert len(np.unique(kept)) == len(kept)
                # every drawn value is represented among the kept ones
                assert set(idx[t, i]) == set(kept)

    def test_rwsadagrad_with_qr_tables(self):
        """Row-wise accumulators on q/r (sparse-grad params in the
        reference's RWSAdagrad) — the single-chip dense step trains."""
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )

        tc = TC.replace(optimizer="rwsadagrad")
        state = init_train_state(QR_CFG, tc)
        step = make_train_step(QR_CFG, tc, sparse_emb_grad=False)
        rng = np.random.RandomState(3)
        for _ in range(3):
            state, loss = step(state, random_batch(QR_CFG, 32, rng))
        assert np.isfinite(float(loss))
        assert state.opt_state["emb"][1]["q"].ndim == 1  # row-wise acc

    def test_md_import_rwsadagrad(self, tmp_path):
        """MD checkpoint import with --optimizer=rwsadagrad: row-wise acc on
        embs.weight, classic Adagrad state on the dense proj."""
        import torch

        from deep_quantized_recommendation_model_dqrm_tpu.tools.torch_import import (
            import_torch_checkpoint,
            params_from_torch_state_dict,
        )

        rs = np.random.RandomState
        sd = {
            "emb_l.0.embs.weight": torch.tensor(rs(0).rand(60, 4).astype(np.float32)),
            "emb_l.0.proj.weight": torch.tensor(rs(1).rand(8, 4).astype(np.float32)),
            "emb_l.1.weight": torch.tensor(rs(2).rand(10, 8).astype(np.float32)),
            "bot_l.0.weight": torch.tensor(np.eye(8, 4, dtype=np.float32)),
            "bot_l.0.bias": torch.zeros(8),
            "top_l.0.weight": torch.tensor(rs(3).rand(1, 11).astype(np.float32)),
            "top_l.0.bias": torch.zeros(1),
        }
        params, arch = params_from_torch_state_dict(sd)
        assert arch["table_kinds"] == ("md", "dense")
        pt = tmp_path / "md.pt"
        torch.save({"state_dict": sd}, pt)
        import_torch_checkpoint(
            str(pt), str(tmp_path / "md.npz"), optimizer="rwsadagrad"
        )

    def test_qr_import_rwsadagrad(self, tmp_path):
        """QR checkpoint import with --optimizer=rwsadagrad (crashed before:
        rwsadagrad_init assumed array tables)."""
        import torch

        from deep_quantized_recommendation_model_dqrm_tpu.models import tricks
        from deep_quantized_recommendation_model_dqrm_tpu.tools.torch_import import (
            import_torch_checkpoint,
            params_from_torch_state_dict,
        )

        sd = {
            "emb_l.0.weight_q": torch.tensor(
                np.random.RandomState(0).rand(15, 8).astype(np.float32)
            ),
            "emb_l.0.weight_r": torch.tensor(
                np.random.RandomState(1).rand(4, 8).astype(np.float32)
            ),
            "emb_l.1.weight": torch.tensor(
                np.random.RandomState(2).rand(10, 8).astype(np.float32)
            ),
            "bot_l.0.weight": torch.tensor(np.eye(8, 4, dtype=np.float32)),
            "bot_l.0.bias": torch.zeros(8),
            "top_l.0.weight": torch.tensor(
                np.random.RandomState(3).rand(1, 11).astype(np.float32)
            ),
            "top_l.0.bias": torch.zeros(1),
        }
        params, arch = params_from_torch_state_dict(sd)
        assert arch["table_kinds"] == ("qr", "dense")
        assert arch["qr_operation"] == "mult-or-add"
        pt = tmp_path / "qr.pt"
        torch.save({"state_dict": sd}, pt)
        out = tmp_path / "qr.npz"
        a = import_torch_checkpoint(
            str(pt), str(out), optimizer="rwsadagrad", qr_operation="add"
        )
        assert a["qr_operation"] == "add"


class TestRowshardTricks:
    """QR/MD trick tables in the ROW-sharded engine (round-5, VERDICT r4 #6):
    carried replicated next to the MLPs exactly as hybrid does (plan
    dense_mask False; grads ride the DDP pmean channel), dense tables keep
    the global-row scatter. Must match single-chip dense autodiff exactly
    when uncompressed."""

    def _mk(self, cfg, tc, n=8):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import rowshard

        mesh = make_mesh(n)
        plan = rowshard.plan_row_sharding(cfg.table_sizes, n, kinds=_kinds(cfg))
        return rowshard, mesh, plan

    def test_plan_excludes_tricks(self):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import rowshard

        plan = rowshard.plan_row_sharding(QR_CFG.table_sizes, 8, kinds=_kinds(QR_CFG))
        assert not plan.dense_mask[1] and not plan.dense_mask[3]
        # dense rows only: 64+30+7 (+1 pad) over 8 devices
        assert plan.n_dev * plan.chunk >= 64 + 30 + 7 + 1
        assert plan.chunk <= (64 + 30 + 7 + 1 + 7) // 8 + 1

    @pytest.mark.parametrize("cfg", [QR_CFG, MD_CFG], ids=["qr", "md"])
    def test_rowshard_matches_single_chip_fp32(self, cfg):
        rowshard, mesh, plan = self._mk(cfg, TC)
        tc = TC.replace(grad_quant_bits=32)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc, sparse_emb_grad=False)
        rng = np.random.RandomState(23)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            rstate, rloss = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sloss = sstep(sstate, b)
            assert np.isclose(float(rloss), float(sloss), rtol=1e-4)
        back = rowshard.unpack_rows(rstate.mega, plan, cfg.table_sizes)
        for k in range(cfg.num_tables):
            if cfg.table_kind(k) == "dense":
                np.testing.assert_allclose(
                    np.asarray(back[k]),
                    np.asarray(sstate.params["emb"][k]),
                    atol=1e-5,
                )
            else:
                assert back[k] is None
                for leaf, ref in zip(
                    jax.tree_util.tree_leaves(rstate.mlp["emb_trick"][str(k)]),
                    jax.tree_util.tree_leaves(sstate.params["emb"][k]),
                ):
                    np.testing.assert_allclose(
                        np.asarray(leaf), np.asarray(ref), atol=1e-5
                    )

    def test_rowshard_eval_matches_single_chip(self):
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        rowshard, mesh, plan = self._mk(QR_CFG, TC)
        tc = TC.replace(grad_quant_bits=32)
        rstate = rowshard.init_rowshard_state(QR_CFG, tc, mesh, plan)
        ev = rowshard.make_rowshard_eval_step(QR_CFG, mesh, plan)
        sstate = init_train_state(QR_CFG, tc)
        b = random_batch(QR_CFG, 64, np.random.RandomState(5))
        probs = np.asarray(ev(rstate, b))
        ref = np.asarray(
            jax.nn.sigmoid(
                dlrm.forward(
                    QR_CFG, sstate.params, b, sstate.qstate, train=False
                )[0]
            )
        )
        np.testing.assert_allclose(probs, ref, atol=1e-5)

    def test_rowshard_qat_with_qr_scales(self):
        """Dense tables' pmin/pmax scales match the single-chip scan; trick
        tables keep the placeholder 1.0 (dlrm.compute_emb_scales parity)."""
        cfg = dataclasses.replace(
            QR_CFG,
            quant=QuantConfig(enabled=True, embedding_bit=4, scale_update_period=2),
        )
        rowshard, mesh, plan = self._mk(cfg, TC)
        tc = TC.replace(grad_quant_bits=32)
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, plan)
        sstate = init_train_state(cfg, tc)
        sstep = make_train_step(cfg, tc, sparse_emb_grad=False)
        rng = np.random.RandomState(3)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            rstate, rl = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(rl), float(sl), rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(rstate.qstate.emb_scales),
            np.asarray(sstate.qstate.emb_scales),
            rtol=1e-6,
        )
        assert np.asarray(rstate.qstate.emb_scales)[1] == 1.0


class TestLearnedVwWithTricks:
    """weighted_pooling='learned' + QR/MD in the mega-table engines
    (round-5, VERDICT r4 #6): dense v_W rides the sharded row layout with
    analytic scatter grads; trick v_W replicates next to the trick tables
    and trains through the recompute's autodiff (DDP pmean) — matching the
    dp/single-chip semantics the reference itself rejects
    (dlrm_s_pytorch.py:1040-1044)."""

    def _vw(self, cfg, seed=0):
        rng = np.random.RandomState(seed)
        vals = [
            rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
            for n in cfg.table_sizes
        ]
        return vals, lambda: [np.array(v) for v in vals]

    def _single(self, cfg, tc, fresh):
        sstate = init_train_state(cfg, tc)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        return sstate, make_train_step(cfg, tc, sparse_emb_grad=False)

    def test_hybrid_learned_vw_qr_matches_single_chip(self):
        import jax.numpy as jnp

        cfg = dataclasses.replace(QR_CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        _, fresh = self._vw(cfg)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8, kinds=_kinds(cfg))
        hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
        vals = fresh()
        hstate = hstate._replace(
            vw=hybrid.pack_vw([jnp.asarray(v) for v in vals], plan, mesh),
            mlp={
                **hstate.mlp,
                "vw_trick": {
                    k: jnp.asarray(vals[int(k)])
                    for k in hstate.mlp["vw_trick"]
                },
            },
        )
        hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
        sstate, sstep = self._single(cfg, tc, fresh)
        rng = np.random.RandomState(31)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            hstate, hl = hstep(hstate, b)
            jax.block_until_ready(hstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(hl), float(sl), rtol=1e-4)
        hv = hybrid.unpack_vw(hstate.vw, plan, cfg.table_sizes)
        moved = 0.0
        for k in range(cfg.num_tables):
            got = (
                hv[k]
                if cfg.table_kind(k) == "dense"
                else hstate.mlp["vw_trick"][str(k)]
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(sstate.params["v_W"][k]), atol=1e-5
            )
            moved = max(
                moved,
                float(
                    np.max(
                        np.abs(
                            np.asarray(sstate.params["v_W"][k])
                            - self._vw(cfg)[0][k]
                        )
                    )
                ),
            )
        assert moved > 1e-6  # learned weights actually trained

    def test_rowshard_learned_vw_qr_matches_single_chip(self):
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.parallel import rowshard

        cfg = dataclasses.replace(QR_CFG, weighted_pooling="learned")
        tc = TC.replace(grad_quant_bits=32)
        _, fresh = self._vw(cfg)
        mesh = make_mesh(8)
        plan = rowshard.plan_row_sharding(cfg.table_sizes, 8, kinds=_kinds(cfg))
        rstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        vals = fresh()
        rstate = rstate._replace(
            vw=rowshard.pack_rows_vw(
                [jnp.asarray(v) for v in vals], plan, mesh
            ),
            mlp={
                **rstate.mlp,
                "vw_trick": {
                    k: jnp.asarray(vals[int(k)])
                    for k in rstate.mlp["vw_trick"]
                },
            },
        )
        rstep = rowshard.make_rowshard_train_step(cfg, tc, mesh, plan)
        sstate, sstep = self._single(cfg, tc, fresh)
        rng = np.random.RandomState(37)
        for _ in range(3):
            b = random_batch(cfg, 64, rng)
            rstate, rl = rstep(rstate, b)
            jax.block_until_ready(rstate)
            sstate, sl = sstep(sstate, b)
            assert np.isclose(float(rl), float(sl), rtol=1e-4)
        rv = rowshard.unpack_rows_vw(rstate.vw, plan, cfg.table_sizes)
        for k in range(cfg.num_tables):
            got = (
                rv[k]
                if cfg.table_kind(k) == "dense"
                else rstate.mlp["vw_trick"][str(k)]
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(sstate.params["v_W"][k]), atol=1e-5
            )

    def test_hybrid_eval_applies_trick_vw(self):
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        cfg = dataclasses.replace(QR_CFG, weighted_pooling="learned")
        _, fresh = self._vw(cfg, seed=4)
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8, kinds=_kinds(cfg))
        hstate = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        vals = fresh()
        hstate = hstate._replace(
            vw=hybrid.pack_vw([jnp.asarray(v) for v in vals], plan, mesh),
            mlp={
                **hstate.mlp,
                "vw_trick": {
                    k: jnp.asarray(vals[int(k)])
                    for k in hstate.mlp["vw_trick"]
                },
            },
        )
        ev = hybrid.make_hybrid_eval_step(cfg, mesh, plan)
        sstate = init_train_state(cfg, TC)
        sstate = sstate._replace(params={**sstate.params, "v_W": fresh()})
        b = random_batch(cfg, 64, np.random.RandomState(41))
        probs = np.asarray(ev(hstate, b))
        ref = np.asarray(dlrm.predict(cfg, sstate.params, b))
        np.testing.assert_allclose(probs, ref, atol=1e-5)
