"""A/B parity of the PACT/DoReFa and LSQ quantized-MLP schemes against the
ACTUAL reference modules (imported from /root/reference at runtime, torch
CPU): QuantLinearPACT (quant_pact_dorefa.py:42-53) and QuantLinearLSQ
(quant_learned_step_size_quan.py:32-57, quantizer/lsq.py). Forward outputs,
input/weight/bias gradients, and the LSQ learned-step gradients must agree.

These are the MLP quantizers the ysx single-GPU driver dispatches on
`--quant-mode pact|lsq` (dlrm_s_pytorch_single_gpu_ysx.py:299-345); our
model reaches them via QuantConfig.quant_scheme through
dlrm._apply_mlp_quant.
"""

import sys

import numpy as np
import pytest

from tests.ref_runner import REFERENCE_DIR, have_reference

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference repo not present"
)


def _import_ref():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from quantization_supp.quant_pact_dorefa import QuantLinearPACT  # noqa
    from quantization_supp.quant_learned_step_size_quan import (  # noqa
        QuantLinearLSQ,
    )

    return QuantLinearPACT, QuantLinearLSQ


def _mk_layer(rng, n_in, n_out):
    w = rng.normal(0, np.sqrt(2.0 / (n_in + n_out)), (n_out, n_in)).astype(
        np.float32
    )
    b = rng.normal(0, np.sqrt(1.0 / n_out), (n_out,)).astype(np.float32)
    return w, b


class TestPACTLinearParity:
    def test_forward_and_grads_match_reference(self):
        import torch

        import jax
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            QuantConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        QuantLinearPACT, _ = _import_ref()
        rng = np.random.RandomState(0)
        n_in, n_out, B = 13, 7, 16
        w, b = _mk_layer(rng, n_in, n_out)
        x = rng.normal(size=(B, n_in)).astype(np.float32)
        gout = rng.normal(size=(B, n_out)).astype(np.float32)

        ref = QuantLinearPACT(n_in, n_out, bias=True, bitwidth=4)
        with torch.no_grad():
            ref.weight.data = torch.tensor(w)
            ref.bias.data = torch.tensor(b)
        xt = torch.tensor(x, requires_grad=True)
        out_ref = ref(xt)
        out_ref.backward(torch.tensor(gout))

        qc = QuantConfig(enabled=True, weight_bit=4, quant_scheme="pact")

        def ours(layer, xin):
            return dlrm._apply_mlp_quant(
                [layer], xin, qc, last_linear=True
            )

        layer = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        out = np.asarray(ours(layer, jnp.asarray(x)))
        np.testing.assert_allclose(
            out, out_ref.detach().numpy(), rtol=1e-5, atol=1e-6
        )

        gl, gx = jax.grad(
            lambda l, xin: jnp.sum(ours(l, xin) * jnp.asarray(gout)),
            argnums=(0, 1),
        )(layer, jnp.asarray(x))
        # DoReFaQuant.backward is IDENTITY over the whole transform
        # (quant_pact_dorefa.py:25-28) — weight grads must equal the grads
        # of a plain linear, which is what the reference produces.
        np.testing.assert_allclose(
            np.asarray(gl["w"]), ref.weight.grad.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gl["b"]), ref.bias.grad.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gx), xt.grad.numpy(), rtol=1e-5, atol=1e-6
        )


class TestLSQLinearParity:
    def test_forward_and_grads_match_reference(self):
        import torch

        import jax
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            QuantConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        _, QuantLinearLSQ = _import_ref()
        rng = np.random.RandomState(1)
        n_in, n_out, B = 11, 5, 8
        w, b = _mk_layer(rng, n_in, n_out)
        x = rng.normal(size=(B, n_in)).astype(np.float32)
        gout = rng.normal(size=(B, n_out)).astype(np.float32)

        base = torch.nn.Linear(n_in, n_out, bias=True)
        with torch.no_grad():
            base.weight.data = torch.tensor(w)
            base.bias.data = torch.tensor(b)
        import contextlib, io

        with contextlib.redirect_stdout(io.StringIO()):
            ref = QuantLinearLSQ(m=base)  # hardcodes bit=4
        xt = torch.tensor(x, requires_grad=True)
        out_ref = ref(xt)
        out_ref.backward(torch.tensor(gout))

        # weight_bit=4 matches the reference ctor's hardcoded bit=4
        qc = QuantConfig(enabled=True, weight_bit=4, quant_scheme="lsq")
        qp = 2 ** (4 - 1) - 1
        steps = {
            "w": jnp.asarray(2.0 * np.abs(w).mean(axis=1) / np.sqrt(qp)),
            "b": jnp.asarray(2.0 * np.abs(b).mean() / np.sqrt(qp)),
        }
        # our init rule must equal the reference's init_from
        np.testing.assert_allclose(
            np.asarray(steps["w"]),
            ref.quan_w_fn.s.detach().numpy().reshape(-1),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(steps["b"]), float(ref.quan_w_fn_2.s), rtol=1e-6
        )

        def ours(layer, st, xin):
            return dlrm._apply_mlp_quant(
                [layer], xin, qc, last_linear=True, lsq_steps=[st]
            )

        layer = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        out = np.asarray(ours(layer, steps, jnp.asarray(x)))
        np.testing.assert_allclose(
            out, out_ref.detach().numpy(), rtol=1e-5, atol=1e-6
        )

        gl, gs, gx = jax.grad(
            lambda l, st, xin: jnp.sum(ours(l, st, xin) * jnp.asarray(gout)),
            argnums=(0, 1, 2),
        )(layer, steps, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(gl["w"]), ref.weight.grad.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gl["b"]), ref.bias.grad.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gx), xt.grad.numpy(), rtol=1e-5, atol=1e-5
        )
        # learned-step gradients (the thing LSQ trains)
        np.testing.assert_allclose(
            np.asarray(gs["w"]),
            ref.quan_w_fn.s.grad.numpy().reshape(-1),
            rtol=1e-4,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(gs["b"]), float(ref.quan_w_fn_2.s.grad), rtol=1e-4, atol=1e-6
        )


class TestSchemeTrajectoryParity:
    """Tiny 2-layer MLP trained with plain SGD for 12 steps: our
    _apply_mlp_quant chain vs the reference modules stacked the way the ysx
    driver stacks them (Linear -> ReLU -> Linear, apply_mlp ysx:576-640)."""

    @pytest.mark.parametrize("scheme", ["pact", "lsq"])
    def test_sgd_trajectory(self, scheme):
        import torch

        import jax
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.config import (
            QuantConfig,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

        QuantLinearPACT, QuantLinearLSQ = _import_ref()
        rng = np.random.RandomState(2)
        dims = [9, 8, 1]
        layers_np = [
            _mk_layer(rng, dims[i], dims[i + 1]) for i in range(len(dims) - 1)
        ]
        lr = 0.05
        steps = 12
        xs = [
            rng.normal(size=(16, dims[0])).astype(np.float32)
            for _ in range(steps)
        ]
        ys = [
            rng.randint(0, 2, size=(16,)).astype(np.float32)
            for _ in range(steps)
        ]

        # --- reference ---
        import contextlib, io

        ref_layers = []
        for (w, b) in layers_np:
            if scheme == "pact":
                m = QuantLinearPACT(
                    w.shape[1], w.shape[0], bias=True, bitwidth=4
                )
                with torch.no_grad():
                    m.weight.data = torch.tensor(w)
                    m.bias.data = torch.tensor(b)
            else:
                base = torch.nn.Linear(w.shape[1], w.shape[0], bias=True)
                with torch.no_grad():
                    base.weight.data = torch.tensor(w)
                    base.bias.data = torch.tensor(b)
                with contextlib.redirect_stdout(io.StringIO()):
                    m = QuantLinearLSQ(m=base)
            ref_layers.append(m)
        params_t = [p for m in ref_layers for p in m.parameters()]
        opt = torch.optim.SGD(params_t, lr=lr)
        bce = torch.nn.BCELoss()
        ref_losses = []
        for x, y in zip(xs, ys):
            h = torch.tensor(x)
            for i, m in enumerate(ref_layers):
                h = m(h)
                h = torch.sigmoid(h) if i == len(ref_layers) - 1 else torch.relu(h)
            loss = bce(h.reshape(-1), torch.tensor(y))
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append(float(loss))

        # --- ours ---
        qc = QuantConfig(enabled=True, weight_bit=4, quant_scheme=scheme)
        params = {
            "mlp": [
                {"w": jnp.asarray(w), "b": jnp.asarray(b)}
                for (w, b) in layers_np
            ]
        }
        if scheme == "lsq":
            qp = 2 ** (4 - 1) - 1
            params["steps"] = [
                {
                    "w": jnp.asarray(2.0 * np.abs(w).mean(axis=1) / np.sqrt(qp)),
                    "b": jnp.asarray(
                        np.float32(2.0 * np.abs(b).mean() / np.sqrt(qp))
                    ),
                }
                for (w, b) in layers_np
            ]

        def loss_fn(p, x, y):
            out = dlrm._apply_mlp_quant(
                p["mlp"],
                jnp.asarray(x),
                qc,
                last_linear=True,
                lsq_steps=p.get("steps"),
            ).reshape(-1)
            pr = jax.nn.sigmoid(out)
            eps = 0.0  # torch BCELoss clamps log at -100; irrelevant here
            return -jnp.mean(
                y * jnp.log(pr + eps) + (1 - y) * jnp.log(1 - pr + eps)
            )

        step = jax.jit(
            lambda p, x, y: (
                loss_fn(p, x, y),
                jax.tree_util.tree_map(
                    lambda pp, g: pp - lr * g,
                    p,
                    jax.grad(loss_fn)(p, x, y),
                ),
            )
        )
        our_losses = []
        for x, y in zip(xs, ys):
            l, params = step(params, jnp.asarray(x), jnp.asarray(y))
            our_losses.append(float(l))

        np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=2e-5)


def _import_ref_emb():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from quantization_supp.quant_pact_dorefa import (  # noqa
        QuantEmbeddingBagPACT,
    )
    from quantization_supp.quant_learned_step_size_quan import (  # noqa
        QuantEmbeddingBagLSQ,
    )

    return QuantEmbeddingBagPACT, QuantEmbeddingBagLSQ


class TestEmbeddingSchemeParity:
    """Embedding-side PACT/LSQ vs the actual reference modules: PACT
    fake-quants the WEIGHT TABLE before the pooled gather
    (QuantEmbeddingBagPACT.forward, quant_pact_dorefa.py:99-104); LSQ pools
    first and fake-quants the POOLED OUTPUT with a learned per-table step
    (QuantEmbeddingBagLSQ.forward, quant_learned_step_size_quan.py:87-103).
    """

    def test_pact_embedding_forward_and_grad(self):
        import torch

        import jax
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            pooled_lookup,
        )

        QuantEmbeddingBagPACT, _ = _import_ref_emb()
        rng = np.random.RandomState(3)
        n, d, B, P = 29, 8, 16, 3
        w = rng.uniform(-0.3, 0.3, size=(n, d)).astype(np.float32)
        idx = rng.randint(0, n, size=(B, P))
        gout = rng.normal(size=(B, d)).astype(np.float32)

        ref = QuantEmbeddingBagPACT(n, d, bitwidth=4)
        with torch.no_grad():
            ref.embedding_bag.weight.data = torch.tensor(w)
        out_ref = ref(
            torch.tensor(idx.reshape(-1)), torch.tensor(np.arange(B) * P)
        )
        out_ref.backward(torch.tensor(gout))
        gw_ref = ref.embedding_bag.weight.grad.to_dense().numpy()

        def ours(table):
            return pooled_lookup(
                q.fake_quant_pact(table, 4), jnp.asarray(idx.astype(np.int32)), None
            )

        out = np.asarray(ours(jnp.asarray(w)))
        np.testing.assert_allclose(
            out, out_ref.detach().numpy(), rtol=1e-5, atol=1e-6
        )
        gw = jax.grad(lambda t: jnp.sum(ours(t) * jnp.asarray(gout)))(
            jnp.asarray(w)
        )
        np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-5, atol=1e-6)

    def test_lsq_embedding_forward_and_grad(self):
        import torch

        import jax
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            pooled_lookup,
        )

        _, QuantEmbeddingBagLSQ = _import_ref_emb()
        rng = np.random.RandomState(4)
        n, d, B, P = 23, 8, 16, 2
        w = rng.uniform(-0.25, 0.25, size=(n, d)).astype(np.float32)
        idx = rng.randint(0, n, size=(B, P))
        gout = rng.normal(size=(B, d)).astype(np.float32)

        ref = QuantEmbeddingBagLSQ(n, d)  # hardcodes bit=4
        with torch.no_grad():
            ref.embedding_bag.weight.data = torch.tensor(w)
        # the ctor ran init_from on its own random W; re-init from the
        # injected table (the driver's create_emb initializes in-module)
        ref.quan_w_fn.init_from(ref.embedding_bag.weight)
        out_ref = ref(
            torch.tensor(idx.reshape(-1)), torch.tensor(np.arange(B) * P)
        )
        out_ref.backward(torch.tensor(gout))
        gw_ref = ref.embedding_bag.weight.grad.to_dense().numpy()

        qp = 2 ** (4 - 1) - 1
        step0 = np.float32(2.0 * np.abs(w).mean() / np.sqrt(qp))
        np.testing.assert_allclose(
            step0, float(ref.quan_w_fn.s.detach()), rtol=1e-6
        )

        def ours(table, s):
            pooled = pooled_lookup(table, jnp.asarray(idx.astype(np.int32)), None)
            return q.fake_quant_lsq(pooled, s, 4)

        out = np.asarray(ours(jnp.asarray(w), jnp.asarray(step0)))
        np.testing.assert_allclose(
            out, out_ref.detach().numpy(), rtol=1e-5, atol=1e-6
        )
        gw, gs = jax.grad(
            lambda t, s: jnp.sum(ours(t, s) * jnp.asarray(gout)), argnums=(0, 1)
        )(jnp.asarray(w), jnp.asarray(step0))
        np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(gs), float(ref.quan_w_fn.s.grad), rtol=1e-4, atol=1e-6
        )
