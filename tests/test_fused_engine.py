"""Fused mega-table engine: equivalence with the per-table sparse step."""

import dataclasses

import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu import fused_engine as fe
from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
    init_train_state,
    make_train_step,
)

CFG = DLRMConfig(
    table_sizes=(100, 50, 10, 70),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(18, 8, 1),
)
TC = TrainConfig(batch_size=32, learning_rate=0.1)


class TestFusedEngine:
    def _compare(self, cfg):
        state = init_train_state(cfg, TC)
        # independent copy: `state` is donated by its step, which would
        # delete buffers shared with fstate
        fstate = fe.to_fused(dlrm.init_params(cfg, seed=TC.seed), cfg)
        step = make_train_step(cfg, TC, sparse_emb_grad=True)
        import jax

        fstep = fe.make_fused_train_step_jit(cfg, TC)
        rng = np.random.RandomState(0)
        for _ in range(3):
            b = random_batch(cfg, 32, rng)
            state, l1 = step(state, b)
            fstate, l2 = fstep(fstate, b)
            assert np.isclose(float(l1), float(l2), rtol=1e-5), (float(l1), float(l2))
        back = fe.from_fused(fstate, cfg)
        for a, b_ in zip(back["emb"], state.params["emb"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
        for da, sa in zip(back["top"], state.params["top"]):
            np.testing.assert_allclose(
                np.asarray(da["w"]), np.asarray(sa["w"]), atol=1e-6
            )

    def test_fp32_matches_per_table(self):
        self._compare(CFG)

    def test_int4_qat_matches_per_table(self):
        cfg = dataclasses.replace(
            CFG,
            quant=QuantConfig(enabled=True, embedding_bit=4, weight_bit=4,
                              scale_update_period=2),
        )
        self._compare(cfg)

    def test_roundtrip_conversion(self):
        params = dlrm.init_params(CFG, seed=3)
        f = fe.to_fused(params, CFG)
        back = fe.from_fused(f, CFG)
        for a, b in zip(params["emb"], back["emb"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
