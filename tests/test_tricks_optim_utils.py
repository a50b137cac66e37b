"""Tests: QR/MD embedding tricks, LR policy, optimizers, metrics, checkpoint."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.models import tricks
from deep_quantized_recommendation_model_dqrm_tpu.optim import lr_policy
from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint import (
    CheckpointManager,
)
from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import (
    accuracy,
    binary_metrics,
    roc_auc,
)


class TestQR:
    @pytest.mark.parametrize("op", ["mult", "add", "concat"])
    def test_qr_shapes_and_compression(self, op):
        qr = tricks.init_qr_table(1000, 16, collisions=4, operation=op)
        idx = jnp.asarray(np.random.RandomState(0).randint(0, 1000, (8, 2)), jnp.int32)
        out = tricks.qr_pooled_lookup(qr, idx)
        assert out.shape == (8, 16)
        # parameter count shrinks vs full table
        n_params = qr["q"].size + qr["r"].size
        assert n_params < 1000 * 16 / 3

    def test_qr_distinct_indices_distinct_rows(self):
        qr = tricks.init_qr_table(100, 8, collisions=10, operation="concat")
        i1 = jnp.asarray([[0]], jnp.int32)
        i2 = jnp.asarray([[11]], jnp.int32)  # different quotient AND remainder
        a = tricks.qr_pooled_lookup(qr, i1)
        b = tricks.qr_pooled_lookup(qr, i2)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestMD:
    def test_md_solver_monotone(self):
        n = np.array([10, 100, 1000, 10000])
        d = tricks.md_solver(n, alpha=0.3, d0=32)
        assert list(d) == sorted(d, reverse=True)  # popular tables get bigger dims
        assert d.max() <= 32

    def test_md_projection(self):
        md = tricks.init_md_table(500, 4, base_dim=16)
        idx = jnp.asarray(np.random.RandomState(1).randint(0, 500, (6, 1)), jnp.int32)
        out = tricks.md_pooled_lookup(md, idx)
        assert out.shape == (6, 16)

    def test_md_identity_when_full_dim(self):
        md = tricks.init_md_table(500, 16, base_dim=16)
        assert "proj" not in md


class TestLRPolicy:
    def test_warmup_then_hold(self):
        # reference: scale = 1 - (warmup - step)/warmup
        assert np.isclose(float(lr_policy(1.0, 5, 10, 100, 50)), 0.5)
        # between warmup and decay the reference holds last_lr from the
        # FINAL warmup step = base_lr * (1 - 1/warmup), not base_lr
        assert np.isclose(float(lr_policy(1.0, 50, 10, 100, 50)), 0.9)
        # without decay configured there is no hold: base_lr after warmup
        assert np.isclose(float(lr_policy(1.0, 50, 10, 0, 0)), 1.0)

    def test_quadratic_decay(self):
        # at step 125 with decay_start=100, nd=50: scale = ((50-25)/50)^2
        assert np.isclose(float(lr_policy(1.0, 125, 10, 100, 50)), 0.25)

    def test_freeze_after_decay(self):
        end_val = float(lr_policy(1.0, 149, 10, 100, 50))
        frozen = float(lr_policy(1.0, 500, 10, 100, 50))
        assert np.isclose(frozen, end_val)
        assert frozen >= 1e-7

    def test_no_decay_config(self):
        assert np.isclose(float(lr_policy(0.1, 1000, 0, 0, 0)), 0.1)


class TestMetrics:
    def test_auc_matches_sklearn_formula(self):
        rng = np.random.RandomState(0)
        y = rng.randint(0, 2, 500)
        s = rng.rand(500) * 0.5 + y * rng.rand(500) * 0.5
        got = roc_auc(s, y)
        # brute-force pairwise AUC
        pos = s[y == 1]; neg = s[y == 0]
        cmp = (pos[:, None] > neg[None, :]).mean() + 0.5 * (
            pos[:, None] == neg[None, :]
        ).mean()
        assert np.isclose(got, cmp, atol=1e-9)

    def test_auc_with_ties(self):
        y = np.array([0, 1, 0, 1])
        s = np.array([0.5, 0.5, 0.5, 0.5])
        assert np.isclose(roc_auc(s, y), 0.5)

    def test_accuracy_rounding(self):
        assert accuracy(np.array([0.4, 0.6]), np.array([0, 1])) == 1.0

    def test_binary_metrics_keys(self):
        m = binary_metrics(np.array([0.9, 0.1, 0.8]), np.array([1, 0, 0]))
        assert set(m) == {"recall", "precision", "f1", "ap", "roc_auc", "accuracy"}
        assert m["recall"] == 1.0


class TestCheckpoint:
    def test_two_slot_rotation_and_restore(self, tmp_path):
        state = {"a": jnp.arange(6.0).reshape(2, 3), "b": [jnp.ones(4), jnp.zeros(2)]}
        mgr = CheckpointManager(str(tmp_path), "t")
        p0 = mgr.save(state, {"epoch": 1})
        state2 = {"a": state["a"] * 2, "b": state["b"]}
        p1 = mgr.save(state2, {"epoch": 2})
        assert p0 != p1
        like = {"a": jnp.zeros((2, 3)), "b": [jnp.zeros(4), jnp.zeros(2)]}
        restored, meta = mgr.restore(like)
        assert meta["epoch"] == 2
        np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(state2["a"]))

    def test_shape_mismatch_rejected(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), "t")
        mgr.save({"a": jnp.zeros((2, 3))}, {})
        with pytest.raises(ValueError):
            mgr.restore({"a": jnp.zeros((3, 3))})

    def test_restore_missing_dir_raises(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "nope"), "t")
        with pytest.raises(FileNotFoundError):
            mgr.restore({"a": jnp.zeros(1)})
