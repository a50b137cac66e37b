"""A/B parity of the QR/MD embedding tricks against the ACTUAL reference
modules (imported from /root/reference/tricks at runtime, torch CPU):
forward outputs, gradients, and the md_solver dimension assignment. Chained
with tests/test_tricks_parallel.py (distributed engines == single chip),
this grounds the whole QR/MD path in reference numerics.
"""

import os
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
