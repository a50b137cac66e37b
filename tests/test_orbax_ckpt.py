"""Orbax sharded checkpointing: save/restore the row-sharded hybrid state."""

import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig, TrainConfig
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import random_batch
from deep_quantized_recommendation_model_dqrm_tpu.parallel import hybrid, make_mesh

CFG = DLRMConfig(
    table_sizes=(64, 200, 30, 500, 7),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(23, 8, 1),
)
TC = TrainConfig(batch_size=32, learning_rate=0.05)


class TestShardedCheckpoint:
    def test_hybrid_state_roundtrip(self, tmp_path):
        import jax

        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
            ShardedCheckpointManager,
        )

        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(CFG.table_sizes, 8)
        state = hybrid.init_hybrid_state(CFG, TC, mesh, plan)
        step = hybrid.make_hybrid_train_step(CFG, TC, mesh, plan)
        state, _ = step(state, random_batch(CFG, 64, np.random.RandomState(0)))
        jax.block_until_ready(state)
        assert len(state.mega.sharding.device_set) == 8  # actually sharded

        mgr = ShardedCheckpointManager(str(tmp_path), "hy")
        mgr.save(state, {"step": 1})

        fresh = hybrid.init_hybrid_state(CFG, TC, mesh, plan)
        restored, meta = mgr.restore(fresh)
        assert meta["step"] == 1
        np.testing.assert_allclose(
            np.asarray(restored.mega), np.asarray(state.mega)
        )
        # restored with the same sharding
        assert restored.mega.sharding == state.mega.sharding

    def test_two_slot_rotation(self, tmp_path):
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
            ShardedCheckpointManager,
        )

        mgr = ShardedCheckpointManager(str(tmp_path), "t")
        s1 = {"a": jnp.ones(4)}
        s2 = {"a": jnp.ones(4) * 2}
        p0 = mgr.save(s1, {"v": 1})
        p1 = mgr.save(s2, {"v": 2})
        assert p0 != p1
        restored, meta = mgr.restore({"a": jnp.zeros(4)})
        assert meta["v"] == 2
        np.testing.assert_allclose(np.asarray(restored["a"]), 2.0)


class TestShardedCheckpointWeightedPooling:
    def test_hybrid_vw_roundtrip(self, tmp_path):
        import dataclasses

        import jax

        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
            ShardedCheckpointManager,
        )

        cfg = dataclasses.replace(CFG, weighted_pooling="learned")
        mesh = make_mesh(8)
        plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
        state = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        step = hybrid.make_hybrid_train_step(cfg, TC, mesh, plan)
        state, _ = step(state, random_batch(cfg, 64, np.random.RandomState(0)))
        jax.block_until_ready(state)
        assert state.vw is not None
        assert len(state.vw.sharding.device_set) == 8  # sharded like mega

        mgr = ShardedCheckpointManager(str(tmp_path), "hyvw")
        mgr.save(state, {"step": 1})
        fresh = hybrid.init_hybrid_state(cfg, TC, mesh, plan)
        restored, meta = mgr.restore(fresh)
        assert meta["step"] == 1
        np.testing.assert_allclose(np.asarray(restored.vw), np.asarray(state.vw))
        assert restored.vw.sharding == state.vw.sharding
