"""Model tests: shapes, forward modes, QAT state, end-to-end loss decrease.

The end-to-end test mirrors the reference's synthetic smoke run
(`python dlrm_s_pytorch.py --data-generation=random`, SURVEY §4.1).
"""

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
    RandomBatchLoader,
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_eval_step,
    make_train_step,
)

TINY = DLRMConfig(
    table_sizes=(100, 50, 10),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


def tiny_cfg(**quant_kw) -> DLRMConfig:
    import dataclasses

    if not quant_kw:
        return TINY
    return dataclasses.replace(TINY, quant=QuantConfig(**quant_kw))


def make_batch(config, batch_size=16, seed=0):
    return random_batch(config, batch_size, np.random.RandomState(seed))


class TestShapes:
    def test_init_params_shapes(self):
        p = dlrm.init_params(TINY, seed=0)
        assert [t.shape for t in p["emb"]] == [(100, 8), (50, 8), (10, 8)]
        assert p["bot"][0]["w"].shape == (16, 4)
        assert p["top"][-1]["w"].shape == (1, 8)

    def test_top_input_dim(self):
        # 3 tables + dense => 4 features => 6 pairs + d=8 => 14
        assert TINY.top_input_dim == 14
        TINY.validate_top()

    def test_forward_fp32(self):
        p = dlrm.init_params(TINY, seed=0)
        logits, qs = dlrm.forward(TINY, p, make_batch(TINY))
        assert logits.shape == (16,)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_cat_interaction(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, interaction="cat", mlp_top=(32, 8, 1))
        p = dlrm.init_params(cfg, seed=0)
        logits, _ = dlrm.forward(cfg, p, make_batch(cfg))
        assert logits.shape == (16,)

    def test_interact_itself(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, interact_itself=True, mlp_top=(18, 8, 1))
        assert cfg.top_input_dim == 18
        p = dlrm.init_params(cfg, seed=0)
        logits, _ = dlrm.forward(cfg, p, make_batch(cfg))
        assert logits.shape == (16,)

    def test_variable_pooling_mask(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, pooling_size=4)
        p = dlrm.init_params(cfg, seed=0)
        b = random_batch(cfg, 8, np.random.RandomState(0), variable_pooling=True)
        assert b.mask is not None and b.mask.shape == (3, 8, 4)
        logits, _ = dlrm.forward(cfg, p, b)
        assert logits.shape == (8,)


class TestQATForward:
    @pytest.mark.parametrize("scheme", ["hawq", "pact", "lsq"])
    def test_quant_forward_finite(self, scheme):
        cfg = tiny_cfg(enabled=True, quant_scheme=scheme, scale_update_period=1)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.init_quant_state(cfg)
        qs = dlrm.update_emb_scales(cfg, p, qs)
        logits, _ = dlrm.forward(cfg, p, make_batch(cfg), qs)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_emb_quant_changes_output(self):
        cfg = tiny_cfg(enabled=True, quantize_mlp=False, embedding_bit=2)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        b = make_batch(cfg)
        lq, _ = dlrm.forward(cfg, p, b, qs)
        lf, _ = dlrm.forward(cfg, p, b, qs, full_precision=True)
        assert not np.allclose(np.asarray(lq), np.asarray(lf))

    def test_full_precision_matches_fp32_path(self):
        cfg = tiny_cfg(enabled=True)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        b = make_batch(cfg)
        l1, _ = dlrm.forward(cfg, p, b, qs, full_precision=True)
        l2, _ = dlrm.forward(TINY, p, b)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)

    def test_quantize_activation_path(self):
        cfg = tiny_cfg(enabled=True, quantize_activation=True, activation_bit=8)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        logits, new_qs = dlrm.forward(cfg, p, make_batch(cfg), qs, train=True)
        assert np.all(np.isfinite(np.asarray(logits)))
        # act ranges initialized from first batch
        assert float(new_qs.act_max[0]) > 0.0

    def test_modify_feature_interaction(self):
        cfg = tiny_cfg(enabled=True, modify_feature_interaction=True)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        b = make_batch(cfg)
        lq, _ = dlrm.forward(cfg, p, b, qs)
        assert np.all(np.isfinite(np.asarray(lq)))
        # INT16 interaction should closely track the float interaction
        cfg2 = tiny_cfg(enabled=True)
        lf, _ = dlrm.forward(cfg2, p, b, qs)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lf), atol=0.05)

    def test_periodic_scale_update(self):
        cfg = tiny_cfg(enabled=True, scale_update_period=3)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.init_quant_state(cfg)
        qs0 = dlrm.update_emb_scales(cfg, p, qs)  # step 0 => refresh
        assert not np.allclose(np.asarray(qs0.emb_scales), 1.0)
        # step 1: no refresh even if params change
        p2 = jax.tree_util.tree_map(lambda x: x * 2.0, p)
        qs1 = dlrm.update_emb_scales(cfg, p2, qs0._replace(step=jnp.int32(1)))
        np.testing.assert_allclose(
            np.asarray(qs1.emb_scales), np.asarray(qs0.emb_scales)
        )
        # step 3: refresh picks up doubled params
        qs3 = dlrm.update_emb_scales(cfg, p2, qs0._replace(step=jnp.int32(3)))
        np.testing.assert_allclose(
            np.asarray(qs3.emb_scales), 2 * np.asarray(qs0.emb_scales), rtol=1e-6
        )


class TestTraining:
    @pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "rwsadagrad"])
    def test_loss_decreases_fp32(self, optimizer):
        tc = TrainConfig(batch_size=64, learning_rate=0.1, optimizer=optimizer)
        state = init_train_state(TINY, tc)
        step = make_train_step(TINY, tc)
        losses = []
        for b in RandomBatchLoader(TINY, 64, 30, seed=5):
            state, loss = step(state, b)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_loss_decreases_qat_int4(self):
        cfg = tiny_cfg(enabled=True, embedding_bit=4, weight_bit=4, scale_update_period=5)
        tc = TrainConfig(batch_size=64, learning_rate=0.1)
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        losses = []
        for b in RandomBatchLoader(cfg, 64, 40, seed=5):
            state, loss = step(state, b)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert int(state.qstate.step) == 40

    def test_eval_step(self):
        tc = TrainConfig(batch_size=32)
        state = init_train_state(TINY, tc)
        ev = make_eval_step(TINY)
        p = ev(state, make_batch(TINY, 32))
        assert p.shape == (32,)
        assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))

    def test_overfit_fixed_batch(self):
        # memorize one batch => loss near zero (sanity of gradients incl. emb)
        tc = TrainConfig(batch_size=32, learning_rate=0.5)
        state = init_train_state(TINY, tc)
        step = make_train_step(TINY, tc)
        b = make_batch(TINY, 32, seed=3)
        for _ in range(150):
            state, loss = step(state, b)
        assert float(loss) < 0.15


class TestLoss:
    def test_bce_matches_reference_formula(self):
        logits = jnp.array([0.5, -1.0, 2.0])
        labels = jnp.array([1.0, 0.0, 1.0])
        p = jax.nn.sigmoid(logits)
        expect = -np.mean(
            np.asarray(labels) * np.log(np.asarray(p))
            + (1 - np.asarray(labels)) * np.log(1 - np.asarray(p))
        )
        assert np.isclose(float(dlrm.bce_loss(logits, labels)), expect, rtol=1e-4)


class TestEpochSchedule:
    def test_config_for_epoch(self):
        import dataclasses

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            config_for_epoch,
        )

        cfg = dataclasses.replace(
            TINY, quant=QuantConfig(enabled=True, weight_bit=8)
        )
        tc = TrainConfig(
            pretrain_epochs=1,
            quantize_mlp_from_epoch=2,
            shift_bit_width_at_epoch=3,
            shift_bit_width_to=4,
        )
        e0 = config_for_epoch(cfg, tc, 0)
        assert not e0.quant.enabled  # FP32 pretrain
        e1 = config_for_epoch(cfg, tc, 1)
        assert e1.quant.enabled and not e1.quant.quantize_mlp  # emb only
        e2 = config_for_epoch(cfg, tc, 2)
        assert e2.quant.quantize_mlp and e2.quant.weight_bit == 8
        e3 = config_for_epoch(cfg, tc, 3)
        assert e3.quant.weight_bit == 4  # shifted down

    def test_no_schedule_is_identity(self):
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            config_for_epoch,
        )

        tc = TrainConfig()
        assert config_for_epoch(TINY, tc, 0) is TINY


class TestWeightedPooling:
    def test_fixed_ones_matches_unweighted(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, weighted_pooling="fixed")
        p = dlrm.init_params(cfg, seed=0)
        b = make_batch(cfg)
        lw, _ = dlrm.forward(cfg, p, b)
        lp = {k: v for k, v in p.items() if k != "v_W"}
        lu, _ = dlrm.forward(TINY, lp, b)
        np.testing.assert_allclose(np.asarray(lw), np.asarray(lu), rtol=1e-6)

    def test_learned_weights_get_gradients(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, weighted_pooling="learned")
        p = dlrm.init_params(cfg, seed=0)
        b = make_batch(cfg)

        def loss(params):
            logits, _ = dlrm.forward(cfg, params, b)
            return dlrm.bce_loss(logits, b.labels)

        g = jax.grad(loss)(p)
        gn = sum(float(jnp.sum(jnp.abs(v))) for v in g["v_W"])
        assert gn > 0.0

    def test_fixed_weights_no_gradients(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, weighted_pooling="fixed")
        p = dlrm.init_params(cfg, seed=0)
        b = make_batch(cfg)

        def loss(params):
            logits, _ = dlrm.forward(cfg, params, b)
            return dlrm.bce_loss(logits, b.labels)

        g = jax.grad(loss)(p)
        gn = sum(float(jnp.sum(jnp.abs(v))) for v in g["v_W"])
        assert gn == 0.0


class TestSparseStep:
    def test_sparse_step_matches_dense_sgd(self):
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s1 = init_train_state(TINY, tc)
        s2 = init_train_state(TINY, tc)
        dense = make_train_step(TINY, tc)
        sparse = make_train_step(TINY, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(0)
        for _ in range(3):
            b = random_batch(TINY, 32, rng)
            s1, l1 = dense(s1, b)
            s2, l2 = sparse(s2, b)
            assert np.isclose(float(l1), float(l2), rtol=1e-5)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
        for da, sa in zip(s1.params["top"], s2.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-6
            )

    def test_sparse_step_qat(self):
        cfg = tiny_cfg(enabled=True, scale_update_period=2)
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s1 = init_train_state(cfg, tc)
        s2 = init_train_state(cfg, tc)
        dense = make_train_step(cfg, tc)
        sparse = make_train_step(cfg, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(1)
        for _ in range(3):
            b = random_batch(cfg, 32, rng)
            s1, l1 = dense(s1, b)
            s2, l2 = sparse(s2, b)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)

    @pytest.mark.parametrize("scheme", ["pact", "lsq"])
    def test_sparse_step_matches_dense_for_schemes(self, scheme):
        """The explicit sparse-update body is EXACT for pact/lsq too:
        PACT's DoReFa STE is identity over the whole weight transform
        (d loss/d table == scatter(g_pooled)); LSQ quantizes the pooled
        OUTPUT, so rows stay a pure gather. This is what lets train.py's
        _sparse_ok and the accuracy proxy take the sparse path for all
        three schemes."""
        cfg = tiny_cfg(enabled=True, quant_scheme=scheme, scale_update_period=2)
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s1 = init_train_state(cfg, tc)
        s2 = init_train_state(cfg, tc)
        dense = make_train_step(cfg, tc)
        sparse = make_train_step(cfg, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(2)
        for _ in range(3):
            b = random_batch(cfg, 32, rng)
            s1, l1 = dense(s1, b)
            s2, l2 = sparse(s2, b)
            assert np.isclose(float(l1), float(l2), rtol=1e-5)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
        for da, sa in zip(s1.params["top"], s2.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-6
            )
        if scheme == "lsq":
            # trainable quantizer steps must follow the same trajectory
            for a, b_ in zip(s1.params["lsq_emb"], s2.params["lsq_emb"]):
                np.testing.assert_allclose(float(a), float(b_), atol=1e-7)
            for pa, pb in zip(
                s1.params["lsq_mlp"]["top"], s2.params["lsq_mlp"]["top"]
            ):
                np.testing.assert_allclose(
                    np.asarray(pa["w"]), np.asarray(pb["w"]), atol=1e-7
                )

    def test_sparse_step_rwsadagrad_close_to_dense(self):
        # coalesced sparse updates match the dense rwsadagrad exactly
        tc = TrainConfig(batch_size=8, learning_rate=0.1, optimizer="rwsadagrad")
        s1 = init_train_state(TINY, tc)
        s2 = init_train_state(TINY, tc)
        dense = make_train_step(TINY, tc)
        sparse = make_train_step(TINY, tc, sparse_emb_grad=True)
        b = random_batch(TINY, 8, np.random.RandomState(4))
        s1, _ = dense(s1, b)
        s2, _ = sparse(s2, b)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


class TestPinnedTableLayout:
    def test_pinned_megastep_matches_default(self):
        """pin_params_layout + jit_with_pinned_tables (row-major device
        layouts for the tables — the Terabyte OOM/speed fix) is a pure
        layout change: trajectories must be identical."""
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            jit_with_pinned_tables,
            make_multi_train_step,
            pin_params_layout,
            stack_batches,
        )

        cfg = tiny_cfg(enabled=True, scale_update_period=4)
        tc = TrainConfig(batch_size=16, learning_rate=0.1)
        K = 4
        rng = np.random.RandomState(3)
        batches = stack_batches([random_batch(cfg, 16, rng) for _ in range(K)])

        s_ref = init_train_state(cfg, tc)
        multi_ref = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
        s_ref, l_ref = multi_ref(s_ref, batches)

        s_pin = init_train_state(cfg, tc)
        s_pin = s_pin._replace(params=pin_params_layout(s_pin.params))
        multi_pin = jit_with_pinned_tables(
            make_multi_train_step(cfg, tc, K, sparse_emb_grad=True, _jit=False),
            s_pin,
        )
        s_pin, l_pin = multi_pin(s_pin, batches)

        assert np.isclose(float(l_ref), float(l_pin), rtol=1e-6)
        for a, b_ in zip(s_ref.params["emb"], s_pin.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-7)


class TestBf16Tables:
    def test_bf16_tables_train_and_track_fp32(self):
        import dataclasses

        cfg16 = dataclasses.replace(TINY, table_dtype="bfloat16")
        tc = TrainConfig(batch_size=64, learning_rate=0.1)
        s32 = init_train_state(TINY, tc)
        s16 = init_train_state(cfg16, tc)
        assert s16.params["emb"][0].dtype == jnp.bfloat16
        st32 = make_train_step(TINY, tc)
        st16 = make_train_step(cfg16, tc)
        rng = np.random.RandomState(0)
        for _ in range(10):
            b = random_batch(TINY, 64, rng)
            s32, l32 = st32(s32, b)
            s16, l16 = st16(s16, b)
        assert abs(float(l32) - float(l16)) < 0.02

    def test_bf16_with_int4_qat(self):
        import dataclasses

        cfg = dataclasses.replace(
            TINY,
            table_dtype="bfloat16",
            quant=QuantConfig(enabled=True, scale_update_period=2),
        )
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s = init_train_state(cfg, tc)
        st = make_train_step(cfg, tc, sparse_emb_grad=True)
        b = random_batch(cfg, 32, np.random.RandomState(1))
        s, loss = st(s, b)
        assert np.isfinite(float(loss))
        assert s.params["emb"][0].dtype == jnp.bfloat16


class TestSparseAdagrad:
    def test_sparse_adagrad_matches_dense(self):
        tc = TrainConfig(batch_size=16, learning_rate=0.1, optimizer="adagrad")
        s1 = init_train_state(TINY, tc)
        s2 = init_train_state(TINY, tc)
        dense = make_train_step(TINY, tc)
        sparse = make_train_step(TINY, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(5)
        for _ in range(3):
            b = random_batch(TINY, 16, rng)
            s1, _ = dense(s1, b)
            s2, _ = sparse(s2, b)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


class TestEmbOnlyWithActQuant:
    def test_branch1_quant_input_applied(self):
        # quantized embeddings + FP32 MLPs + quantize_activation: the dense
        # input passes through quant_input (comm_grad.py:846-853)
        cfg = tiny_cfg(enabled=True, quantize_mlp=False, quantize_activation=True,
                       activation_bit=4, scale_update_period=1)
        p = dlrm.init_params(cfg, seed=0)
        qs = dlrm.update_emb_scales(cfg, p, dlrm.init_quant_state(cfg))
        b = make_batch(cfg)
        l1, qs1 = dlrm.forward(cfg, p, b, qs, train=True)
        # act range must have been recorded for the input QuantAct
        assert float(qs1.act_max[0]) > 0.0
        # differs from the no-act-quant emb-only path at 4-bit input quant
        cfg2 = tiny_cfg(enabled=True, quantize_mlp=False, scale_update_period=1)
        l2, _ = dlrm.forward(cfg2, p, b, qs, train=True)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))


class TestMultiStepDispatch:
    def test_k_step_megastep_matches_single_steps(self):
        """make_multi_train_step(k) is numerically identical to k calls of
        the single jitted step (it exists purely to amortize host dispatch
        overhead)."""
        import numpy as np

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            DLRMConfig,
            QuantConfig,
            TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            random_batch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_multi_train_step,
            make_train_step,
        )

        cfg = DLRMConfig(
            table_sizes=(50, 20, 9),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            quant=QuantConfig(enabled=True, scale_update_period=2),
        )
        tc = TrainConfig(batch_size=16, learning_rate=0.1)
        rng = np.random.RandomState(3)
        batches = [random_batch(cfg, 16, rng) for _ in range(8)]

        s1 = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc, sparse_emb_grad=True)
        for b in batches:
            s1, l1 = step(s1, b)

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            stack_batches,
        )

        s2 = init_train_state(cfg, tc)
        multi = make_multi_train_step(cfg, tc, 4, sparse_emb_grad=True)
        s2, l2a = multi(s2, batches[:4])          # list form
        s2, l2 = multi(s2, stack_batches(batches[4:]))  # stacked form

        assert float(l1) == float(l2)
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        for la, lb in zip(s1.params["top"], s2.params["top"]):
            np.testing.assert_array_equal(np.asarray(la["w"]), np.asarray(lb["w"]))
        assert int(s2.qstate.step) == 8


class TestQRMDTraining:
    def _train_auc(self, cfg, n=250, seed=0):
        import numpy as np

        from deep_quantized_recommendation_model_dqrm_tpu.config import TrainConfig
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            LearnableSyntheticLoader,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm as m
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import roc_auc

        tc = TrainConfig(batch_size=128, learning_rate=0.2)
        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc)
        for b in LearnableSyntheticLoader(cfg, 128, n, seed=seed):
            state, _ = step(state, b)
        scores, ys = [], []
        for b in LearnableSyntheticLoader(cfg, 512, 2, seed=seed + 999):
            scores.append(np.asarray(m.predict(cfg, state.params, b, state.qstate)))
            ys.append(np.asarray(b.labels))
        return roc_auc(np.concatenate(scores), np.concatenate(ys))

    def test_qr_model_learns(self):
        import dataclasses

        from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig

        cfg = DLRMConfig(
            table_sizes=(400, 150, 50),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            qr_flag=True,
            qr_threshold=100,
            qr_collisions=4,
        )
        auc = self._train_auc(cfg)
        assert auc > 0.58, f"QR model failed to learn: AUC {auc}"

    def test_md_model_learns(self):
        from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig

        cfg = DLRMConfig(
            table_sizes=(400, 150, 50),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            md_flag=True,
            md_threshold=100,
            md_temperature=0.4,
        )
        # md dims shrink the big tables; projection restores base dim
        dims = cfg.md_dims()
        assert dims[0] < 8 or dims[0] == 8  # rule applied
        auc = self._train_auc(cfg)
        assert auc > 0.58, f"MD model failed to learn: AUC {auc}"

    def test_qr_qat_keeps_qr_tables_fp(self):
        """Under QAT, QR tables stay full-precision (reference create_emb
        dispatch order) — scales for those slots are placeholders."""
        import dataclasses

        import numpy as np

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            DLRMConfig,
            QuantConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm as m

        cfg = DLRMConfig(
            table_sizes=(400, 50),
            embedding_dim=8,
            mlp_bot=(4, 8, 8),
            mlp_top=(11, 4, 1),
            qr_flag=True,
            qr_threshold=100,
            quant=QuantConfig(enabled=True, scale_update_period=1),
        )
        params = m.init_params(cfg, 0)
        assert isinstance(params["emb"][0], dict) and "q" in params["emb"][0]
        scales = np.asarray(m.compute_emb_scales(cfg, params))
        assert scales[0] == 1.0  # placeholder for the QR slot
        assert scales[1] != 1.0  # real scale for the dense table


class TestSparseStepTricks:
    """The sparse step's trick/dense gradient split (ported from
    parallel/comm_grad.py): QR/MD tables differentiate through the
    splice_trick_pooled recompute, learned v_W gets analytic sparse scalar
    grads — both must match the dense-autodiff body EXACTLY so train.py's
    _sparse_ok can always take the sparse path."""

    QR = DLRMConfig(
        table_sizes=(400, 150, 50),
        embedding_dim=8,
        mlp_bot=(4, 16, 8),
        mlp_top=(14, 8, 1),
        qr_flag=True,
        qr_threshold=100,
        qr_collisions=4,
    )

    def _run_pair(self, cfg, tc, nsteps=3, seed=7):
        s1 = init_train_state(cfg, tc)
        s2 = init_train_state(cfg, tc)
        dense = make_train_step(cfg, tc)
        sparse = make_train_step(cfg, tc, sparse_emb_grad=True)
        rng = np.random.RandomState(seed)
        for _ in range(nsteps):
            b = random_batch(cfg, 32, rng)
            s1, l1 = dense(s1, b)
            s2, l2 = sparse(s2, b)
            assert np.isclose(float(l1), float(l2), rtol=1e-5)
        return s1, s2

    def _assert_emb_match(self, s1, s2, atol=1e-6):
        for a, b_ in zip(s1.params["emb"], s2.params["emb"]):
            if isinstance(a, dict):
                for kk in a:
                    np.testing.assert_allclose(
                        np.asarray(a[kk], np.float32),
                        np.asarray(b_[kk], np.float32),
                        atol=atol, err_msg=f"trick leaf {kk}",
                    )
            else:
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), atol=atol
                )
        for da, sa in zip(s1.params["top"], s2.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=atol
            )

    @pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
    def test_qr_sparse_matches_dense(self, opt):
        tc = TrainConfig(batch_size=32, learning_rate=0.1, optimizer=opt)
        s1, s2 = self._run_pair(self.QR, tc)
        self._assert_emb_match(s1, s2, atol=2e-6)

    def test_md_sparse_matches_dense(self):
        cfg = DLRMConfig(
            table_sizes=(400, 150, 50),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(14, 8, 1),
            md_flag=True,
            md_threshold=100,
            md_temperature=0.4,
        )
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s1, s2 = self._run_pair(cfg, tc)
        self._assert_emb_match(s1, s2)

    @pytest.mark.parametrize("opt", ["sgd", "adagrad", "rwsadagrad"])
    def test_learned_pooling_sparse_matches_dense(self, opt):
        import dataclasses

        cfg = dataclasses.replace(TINY, weighted_pooling="learned")
        tc = TrainConfig(batch_size=32, learning_rate=0.1, optimizer=opt)
        s1, s2 = self._run_pair(cfg, tc)
        self._assert_emb_match(s1, s2)
        moved = 0.0
        for a, b_ in zip(s1.params["v_W"], s2.params["v_W"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-6
            )
            moved += float(np.sum(np.abs(np.asarray(a) - 1.0)))
        assert moved > 0.0  # learned weights actually trained

    def test_qr_learned_pooling_qat_combo(self):
        """QR + learned pooling + INT4 QAT together on the sparse path."""
        import dataclasses

        cfg = dataclasses.replace(
            self.QR,
            weighted_pooling="learned",
            quant=QuantConfig(enabled=True, scale_update_period=2),
        )
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        s1, s2 = self._run_pair(cfg, tc)
        self._assert_emb_match(s1, s2, atol=2e-6)
        for a, b_ in zip(s1.params["v_W"], s2.params["v_W"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-6)

    def test_qr_sparse_megastep_scan(self):
        """Trick tables survive the lax.scan megastep dispatch."""
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            make_multi_train_step,
            stack_batches,
        )

        tc = TrainConfig(batch_size=16, learning_rate=0.1)
        s1 = init_train_state(self.QR, tc)
        s2 = init_train_state(self.QR, tc)
        single = make_train_step(self.QR, tc, sparse_emb_grad=True)
        multi = make_multi_train_step(self.QR, tc, 4, sparse_emb_grad=True)
        rng = np.random.RandomState(3)
        batches = [random_batch(self.QR, 16, rng) for _ in range(4)]
        for b in batches:
            s1, l1 = single(s1, b)
        s2, l2 = multi(s2, stack_batches(batches))
        assert np.isclose(float(l1), float(l2), rtol=1e-5)
        self._assert_emb_match(s1, s2)
