"""A/B parity of the QR/MD embedding tricks against the ACTUAL reference
modules (imported from /root/reference/tricks at runtime, torch CPU):
forward outputs, gradients, and the md_solver dimension assignment. Chained
with tests/test_tricks_parallel.py (distributed engines == single chip),
this grounds the whole QR/MD path in reference numerics.
"""

import sys

import numpy as np
import pytest

from tests.ref_runner import REFERENCE_DIR, have_reference

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference repo not present"
)


def _import_tricks():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from tricks.md_embedding_bag import PrEmbeddingBag, md_solver  # noqa
    from tricks.qr_embedding_bag import QREmbeddingBag  # noqa

    return QREmbeddingBag, PrEmbeddingBag, md_solver


class TestQRParity:
    @pytest.mark.parametrize("operation", ["mult", "add", "concat"])
    def test_forward_and_grad_match_reference(self, operation):
        import torch

        QREmbeddingBag, _, _ = _import_tricks()
        from deep_quantized_recommendation_model_dqrm_tpu.models.tricks import (
            qr_pooled_lookup,
        )

        import jax
        import jax.numpy as jnp

        n, c, d, B, P = 37, 4, 8, 16, 3
        rng = np.random.RandomState(0)
        num_q = (n + c - 1) // c
        d_q = d_r = d
        if operation == "concat":
            d_q, d_r = d // 2, d - d // 2
        q = rng.uniform(-0.2, 0.2, size=(num_q, d_q)).astype(np.float32)
        r = rng.uniform(-0.2, 0.2, size=(c, d_r)).astype(np.float32)
        idx = rng.randint(0, n, size=(B, P)).astype(np.int64)
        gout = rng.normal(size=(B, d)).astype(np.float32)

        # reference module, weights injected (create_emb passes mode="sum",
        # sparse=True, dlrm_s_pytorch.py:249-262; dense grads for comparison)
        ref = QREmbeddingBag(
            n, [d_q, d_r] if operation == "concat" else d, c,
            operation=operation, mode="sum", sparse=False,
            _weight=[torch.tensor(q), torch.tensor(r)],
        )
        flat = torch.tensor(idx.reshape(-1))
        offsets = torch.tensor(np.arange(B) * P)
        out_ref = ref(flat, offsets)
        out_ref.backward(torch.tensor(gout))

        table = {"q": jnp.asarray(q), "r": jnp.asarray(r)}

        def ours(t):
            return qr_pooled_lookup(
                t, jnp.asarray(idx.astype(np.int32)), None,
                collisions=c, operation=operation,
            )

        out = np.asarray(ours(table))
        np.testing.assert_allclose(
            out, out_ref.detach().numpy(), rtol=1e-5, atol=1e-6
        )

        grads = jax.grad(lambda t: jnp.sum(ours(t) * jnp.asarray(gout)))(table)
        np.testing.assert_allclose(
            np.asarray(grads["q"]), ref.weight_q.grad.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grads["r"]), ref.weight_r.grad.numpy(), rtol=1e-5, atol=1e-6
        )


class TestMDParity:
    def test_forward_and_grad_match_reference(self):
        import torch

        _, PrEmbeddingBag, _ = _import_tricks()
        from deep_quantized_recommendation_model_dqrm_tpu.models.tricks import (
            md_pooled_lookup,
        )

        import jax
        import jax.numpy as jnp

        n, d, base, B, P = 29, 4, 8, 16, 3
        rng = np.random.RandomState(1)
        ref = PrEmbeddingBag(n, d, base)
        w = ref.embs.weight.detach().numpy().copy()
        proj = ref.proj.weight.detach().numpy().copy()  # [base, d]
        idx = rng.randint(0, n, size=(B, P)).astype(np.int64)
        gout = rng.normal(size=(B, base)).astype(np.float32)

        flat = torch.tensor(idx.reshape(-1))
        offsets = torch.tensor(np.arange(B) * P)
        out_ref = ref(flat, offsets)
        out_ref.backward(torch.tensor(gout))

        table = {"table": jnp.asarray(w), "proj": jnp.asarray(proj)}

        def ours(t):
            return md_pooled_lookup(t, jnp.asarray(idx.astype(np.int32)), None)

        np.testing.assert_allclose(
            np.asarray(ours(table)), out_ref.detach().numpy(),
            rtol=1e-5, atol=1e-6,
        )
        grads = jax.grad(lambda t: jnp.sum(ours(t) * jnp.asarray(gout)))(table)
        # sparse=True: torch grad is a sparse COO over touched rows
        gw_ref = ref.embs.weight.grad
        gw_ref = gw_ref.to_dense().numpy() if gw_ref.is_sparse else gw_ref.numpy()
        np.testing.assert_allclose(
            np.asarray(grads["table"]), gw_ref, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grads["proj"]), ref.proj.weight.grad.numpy(),
            rtol=1e-5, atol=1e-6,
        )

    @pytest.mark.parametrize("round_dim", [True, False])
    @pytest.mark.parametrize("alpha", [0.2, 0.3, 0.55])
    def test_md_solver_matches_reference(self, round_dim, alpha):
        import torch

        _, _, ref_solver = _import_tricks()
        from deep_quantized_recommendation_model_dqrm_tpu.models.tricks import (
            md_solver,
        )

        sizes = [1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145]
        ref_d = ref_solver(
            torch.tensor(sizes), alpha, d0=16, round_dim=round_dim
        ).numpy()
        ours = md_solver(np.asarray(sizes), alpha, d0=16, round_dim=round_dim)
        np.testing.assert_array_equal(np.asarray(ours, np.int64), ref_d)


def _weights_numpy(params):
    def conv(t):
        if isinstance(t, dict):
            return {k: np.asarray(v) for k, v in t.items()}
        return np.asarray(t)

    return {
        "emb": [conv(t) for t in params["emb"]],
        "bot": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])} for l in params["bot"]],
        "top": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])} for l in params["top"]],
    }


class TestTricksFullModelTrajectory:
    """Full-model FP32 QR/MD trajectory A/B vs the UPSTREAM reference driver
    (dlrm_s_pytorch.py DLRM_Net with qr_flag/md_flag): identical init and
    batches (pooling size 3, so the pool-then-compose order is exercised),
    per-step losses and final params must agree."""

    B, P, N_STEPS, LR = 16, 3, 12, 0.05

    def _batches(self, table_sizes, seed=0):
        rng = np.random.RandomState(seed)
        out = []
        for _ in range(self.N_STEPS):
            out.append({
                "dense": rng.uniform(0, 1, size=(self.B, 4)).astype(np.float32),
                "indices": np.stack([
                    rng.randint(0, n, size=(self.B, self.P))
                    for n in table_sizes
                ]).astype(np.int64),
                "labels": (rng.uniform(size=self.B) < 0.5).astype(np.float32),
            })
        return out

    def _run_ab(self, cfg, kind, md_dims=None, qr_operation="mult"):
        import jax

        from deep_quantized_recommendation_model_dqrm_tpu.config import TrainConfig
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )
        from tests.ref_runner import run_reference_tricks

        tc = TrainConfig(batch_size=self.B, learning_rate=self.LR, seed=5)
        batches = self._batches(cfg.table_sizes)
        params0 = dlrm.init_params(cfg, tc.seed)
        ref = run_reference_tricks(
            _weights_numpy(params0),
            cfg.table_sizes,
            batches,
            self.LR,
            kind=kind,
            qr_collisions=cfg.qr_collisions,
            qr_operation=qr_operation,
            threshold=cfg.qr_threshold if kind == "qr" else cfg.md_threshold,
            md_dims=md_dims,
        )

        state = init_train_state(cfg, tc)
        step = make_train_step(cfg, tc, sparse_emb_grad=False)
        losses = []
        for b in batches:
            batch = dlrm.Batch(
                dense=b["dense"],
                indices=b["indices"].astype(np.int32),
                labels=b["labels"],
            )
            state, loss = step(state, batch)
            losses.append(float(loss))

        dev = np.max(np.abs(np.array(losses) - np.array(ref["losses"]))
                     / (np.abs(np.array(ref["losses"])) + 1e-9))
        assert dev < 5e-4, (losses, ref["losses"])
        for ours, theirs in zip(state.params["emb"], ref["params"]["emb"]):
            # dicts flatten key-sorted on both sides; arrays are single leaves
            for leaf_o, leaf_r in zip(
                jax.tree_util.tree_leaves(ours),
                jax.tree_util.tree_leaves(theirs),
            ):
                np.testing.assert_allclose(
                    np.asarray(leaf_o), np.asarray(leaf_r), atol=2e-4
                )

    @pytest.mark.parametrize("operation", ["mult", "concat"])
    def test_qr_full_model(self, operation):
        from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig

        cfg = DLRMConfig(
            table_sizes=(60, 30, 11, 5),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(18, 12, 1),
            qr_flag=True,
            qr_threshold=20,
            qr_collisions=4,
            qr_operation=operation,
        )
        self._run_ab(cfg, "qr", qr_operation=operation)

    def test_md_full_model(self):
        from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig

        cfg = DLRMConfig(
            table_sizes=(60, 30, 11, 5),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(18, 12, 1),
            md_flag=True,
            md_threshold=3,  # ALL tables mixed-dim (the reference's create_emb
            # else-branch cannot take the per-table dim array anyway)
            md_temperature=0.3,
            md_round_dims=True,
        )
        self._run_ab(cfg, "md", md_dims=np.asarray(cfg.md_dims()))


class TestWeightedPoolingTrajectory:
    """Full-model FP32 weighted-pooling trajectory A/B vs the UPSTREAM
    reference driver (dlrm_s_pytorch.py --weighted-pooling, per_sample_weights
    at :417-448): identical init, non-trivial v_W, pooling size 3. "learned"
    trains v_W through autograd on the reference side and through our dense /
    analytic-sparse paths; trajectories and final v_W must agree."""

    B, P, N_STEPS, LR = 16, 3, 12, 0.05

    def _run_ab(self, pooling):
        import jax

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            DLRMConfig,
            TrainConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )
        from tests.ref_runner import run_reference_tricks

        cfg = DLRMConfig(
            table_sizes=(60, 30, 11, 5),
            embedding_dim=8,
            mlp_bot=(4, 16, 8),
            mlp_top=(18, 12, 1),
            weighted_pooling=pooling,
        )
        tc = TrainConfig(batch_size=self.B, learning_rate=self.LR, seed=5)
        rng = np.random.RandomState(42)
        vw = [
            rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
            for n in cfg.table_sizes
        ]
        traj = TestTricksFullModelTrajectory()
        batches = traj._batches(cfg.table_sizes)
        params0 = dlrm.init_params(cfg, tc.seed)
        ref = run_reference_tricks(
            _weights_numpy(params0),
            cfg.table_sizes,
            batches,
            self.LR,
            kind="dense",
            weighted_pooling=pooling,
            v_W=vw,
        )

        state = init_train_state(cfg, tc)
        state = state._replace(
            params={
                **state.params,
                "v_W": [np.array(v) for v in vw],
            }
        )
        step = make_train_step(cfg, tc, sparse_emb_grad=False)
        losses = []
        for b in batches:
            batch = dlrm.Batch(
                dense=b["dense"],
                indices=b["indices"].astype(np.int32),
                labels=b["labels"],
            )
            state, loss = step(state, batch)
            losses.append(float(loss))

        dev = np.max(
            np.abs(np.array(losses) - np.array(ref["losses"]))
            / (np.abs(np.array(ref["losses"])) + 1e-9)
        )
        assert dev < 5e-4, (losses, ref["losses"])
        for k in range(cfg.num_tables):
            np.testing.assert_allclose(
                np.asarray(state.params["v_W"][k]),
                ref["params"]["v_W"][k],
                atol=2e-4,
            )
            np.testing.assert_allclose(
                np.asarray(state.params["emb"][k]),
                ref["params"]["emb"][k],
                atol=2e-4,
            )
        if pooling == "learned":
            moved = max(
                float(np.max(np.abs(ref["params"]["v_W"][k] - vw[k])))
                for k in range(cfg.num_tables)
            )
            assert moved > 1e-6  # the reference actually trained v_W
        else:
            for k in range(cfg.num_tables):
                np.testing.assert_array_equal(ref["params"]["v_W"][k], vw[k])

    def test_learned_full_model(self):
        self._run_ab("learned")

    def test_fixed_full_model(self):
        self._run_ab("fixed")
