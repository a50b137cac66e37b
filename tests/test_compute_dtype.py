"""bf16 compute-dtype path: MXU-native matmuls with fp32 master weights.

TPU-first extension (no reference analogue — the reference runs fp32 CUDA
throughout): `DLRMConfig.compute_dtype="bfloat16"` casts MLP/interaction
matmul operands to bf16 with fp32 accumulation. These tests pin down that
(a) the bf16 forward tracks the fp32 forward closely, (b) training still
converges with fp32 parameters preserved, and (c) the QAT weight-quant
path composes with it.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

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
    make_train_step,
)

BASE = DLRMConfig(
    table_sizes=(100, 50, 10),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


def _cfg(compute_dtype="bfloat16", **quant_kw):
    return dataclasses.replace(
        BASE,
        compute_dtype=compute_dtype,
        quant=QuantConfig(**quant_kw) if quant_kw else BASE.quant,
    )


class TestBf16Forward:
    def test_fp_forward_tracks_fp32(self):
        batch = random_batch(BASE, 32, np.random.RandomState(0))
        params = dlrm.init_params(BASE, seed=0)
        ref, _ = dlrm.forward(BASE, params, batch, train=False)
        got, _ = dlrm.forward(_cfg(), params, batch, train=False)
        assert got.dtype == jnp.float32  # accumulation/output stays fp32
        # bf16 has ~3 decimal digits; logits are O(1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.08)

    def test_qat_forward_tracks_fp32_compute(self):
        cfg32 = _cfg("float32", enabled=True, embedding_bit=4, weight_bit=4,
                     scale_update_period=1)
        cfg16 = _cfg("bfloat16", enabled=True, embedding_bit=4, weight_bit=4,
                     scale_update_period=1)
        batch = random_batch(cfg32, 32, np.random.RandomState(1))
        params = dlrm.init_params(cfg32, seed=0)
        qstate = dlrm.update_emb_scales(cfg32, params, dlrm.init_quant_state(cfg32))
        ref, _ = dlrm.forward(cfg32, params, batch, qstate, train=False)
        got, _ = dlrm.forward(cfg16, params, batch, qstate, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.08)

    def test_params_stay_fp32_and_loss_decreases(self):
        cfg = _cfg("bfloat16", enabled=True, embedding_bit=4, weight_bit=4,
                   scale_update_period=4)
        tc = TrainConfig(batch_size=32, learning_rate=0.1)
        state = init_train_state(cfg, tc, seed=0)
        step = make_train_step(cfg, tc)
        loader = RandomBatchLoader(cfg, tc.batch_size, num_batches=60, seed=3)
        losses = []
        for batch in loader:
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert state.params["bot"][0]["w"].dtype == jnp.float32
        assert np.mean(losses[-10:]) < np.mean(losses[:10])
        assert np.isfinite(losses).all()

    def test_cli_maps_compute_dtype(self):
        from deep_quantized_recommendation_model_dqrm_tpu.train import (
            build_parser,
            make_configs,
        )

        args = build_parser().parse_args(
            [
                "--arch-embedding-size", "10-10",
                "--arch-sparse-feature-size", "4",
                "--arch-mlp-bot", "4-8-4",
                "--arch-mlp-top", "7-4-1",
                "--compute-dtype", "bfloat16",
            ]
        )
        cfg = make_configs(args)[0]
        assert cfg.compute_dtype == "bfloat16"
