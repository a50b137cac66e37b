"""Tests: torch-checkpoint importer (reference -> our npz format).

Round-trips the ACTUAL reference model's torch.save checkpoint
(dlrm_s_pytorch.py:863-869 model_metrics_dict layout) through
tools/torch_import and asserts bit-identical weights, loadability into an
initialized TrainState, and matching forward logits.
"""

import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.tools.torch_import import (
    import_torch_checkpoint,
    params_from_torch_state_dict,
)

from ref_runner import have_reference

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference checkout not available"
)

TABLE_SIZES = (40, 20, 7)
D = 8
CFG = DLRMConfig(
    table_sizes=TABLE_SIZES,
    embedding_dim=D,
    mlp_bot=(4, 12, D),
    mlp_top=(14, 8, 1),
)


def _build_ref_model(mode="fp32"):
    import ref_runner

    ref = ref_runner._import_reference()
    params0 = dlrm.init_params(CFG, 3)
    weights = {
        "emb": [np.asarray(t) for t in params0["emb"]],
        "bot": [
            {"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
            for l in params0["bot"]
        ],
        "top": [
            {"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
            for l in params0["top"]
        ],
    }
    model = ref_runner._build_model(ref, weights, mode, 4, 4)
    return model, weights


class TestTorchImport:
    def test_state_dict_mapping_fp32(self):
        model, weights = _build_ref_model("fp32")
        params, arch = params_from_torch_state_dict(model.state_dict())
        assert arch["table_sizes"] == TABLE_SIZES
        assert arch["embedding_dim"] == D
        assert arch["mlp_bot"] == CFG.mlp_bot
        assert arch["mlp_top"] == CFG.mlp_top
        for a, b in zip(params["emb"], weights["emb"]):
            np.testing.assert_array_equal(a, b)
        for part in ("bot", "top"):
            for la, lb in zip(params[part], weights[part]):
                np.testing.assert_array_equal(la["w"], lb["w"])
                np.testing.assert_array_equal(la["b"], lb["b"])

    def test_state_dict_mapping_qat_variant(self):
        """QAT state dicts key tables as emb_l.{k}.embedding_bag.weight and
        carry quant buffers that must be skipped, not crashed on."""
        model, weights = _build_ref_model("full4")
        params, arch = params_from_torch_state_dict(model.state_dict())
        assert arch["table_sizes"] == TABLE_SIZES
        for a, b in zip(params["emb"], weights["emb"]):
            np.testing.assert_array_equal(a, b)

    def test_full_import_roundtrip_and_forward_parity(self, tmp_path):
        import torch

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint import (
            load_checkpoint,
        )

        model, weights = _build_ref_model("fp32")
        pt_path = tmp_path / "ref_ckpt.pt"
        torch.save(
            {"state_dict": model.state_dict(), "epoch": 2, "iter": 77},
            pt_path,
        )
        out_path = tmp_path / "imported.npz"
        arch = import_torch_checkpoint(str(pt_path), str(out_path))
        assert arch["table_sizes"] == TABLE_SIZES

        tc = TrainConfig(batch_size=1)
        like = init_train_state(CFG, tc)
        state, meta = load_checkpoint(str(out_path), like)
        assert meta["iter"] == 77
        for a, b in zip(state.params["emb"], weights["emb"]):
            np.testing.assert_array_equal(np.asarray(a), b)

        # forward parity: imported params must reproduce the torch model's
        # probabilities on a random batch
        rng = np.random.RandomState(0)
        B = 8
        dense = rng.uniform(0, 1, size=(B, 4)).astype(np.float32)
        idx = np.stack(
            [rng.randint(0, n, size=B) for n in TABLE_SIZES]
        ).astype(np.int64)
        labels = np.zeros(B, np.float32)

        lS_i = [torch.tensor(idx[k]) for k in range(len(TABLE_SIZES))]
        lS_o = [torch.arange(B) for _ in lS_i]
        with torch.no_grad():
            z_ref = model(torch.tensor(dense), lS_o, lS_i).numpy().reshape(-1)

        batch = dlrm.Batch(
            dense=dense,
            indices=idx[:, :, None].astype(np.int32),
            labels=labels,
        )
        logits, _ = dlrm.forward(
            CFG, state.params, batch, state.qstate, train=False,
            full_precision=True,
        )
        probs = np.asarray(jax_sigmoid(logits)).reshape(-1)
        np.testing.assert_allclose(probs, z_ref, rtol=1e-5, atol=1e-6)


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)


class TestMigrationWorkflow:
    def test_reference_trained_then_continue_training_here(self, tmp_path):
        """The full migration story: train the reference N steps, torch.save,
        import, continue training with our engine — the continued trajectory
        must match what the reference itself would have produced over the
        same additional batches."""
        import torch

        import ref_runner
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_train_step,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint import (
            load_checkpoint,
        )

        rng = np.random.RandomState(11)
        B, LR = 16, 0.05

        def mk_batches(n):
            out = []
            for _ in range(n):
                out.append(
                    {
                        "dense": rng.uniform(0, 1, size=(B, 4)).astype(np.float32),
                        "indices": np.stack(
                            [rng.randint(0, t, size=B) for t in TABLE_SIZES]
                        ).astype(np.int64),
                        "labels": (rng.uniform(size=B) < 0.5).astype(np.float32),
                    }
                )
            return out

        pre, post = mk_batches(8), mk_batches(6)

        # phase 1: reference trains `pre`, then keeps going over `post`
        # (the counterfactual trajectory we must match)
        params0 = dlrm.init_params(CFG, 3)
        weights = {
            "emb": [np.asarray(t) for t in params0["emb"]],
            "bot": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
                    for l in params0["bot"]],
            "top": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
                    for l in params0["top"]],
        }
        ref_pre = ref_runner.run_reference(weights, pre, lr=LR, mode="fp32")
        ref_full = ref_runner.run_reference(weights, pre + post, lr=LR, mode="fp32")

        # phase 2: torch.save the step-8 model, import, continue here
        model = ref_runner._build_model(
            ref_runner._import_reference(), ref_pre["params"], "fp32", 4, 4
        )
        pt_path = tmp_path / "mid_training.pt"
        torch.save({"state_dict": model.state_dict()}, pt_path)
        out_path = tmp_path / "imported.npz"
        import_torch_checkpoint(str(pt_path), str(out_path))

        tc = TrainConfig(batch_size=B, learning_rate=LR)
        state, _ = load_checkpoint(str(out_path), init_train_state(CFG, tc))
        step = make_train_step(CFG, tc, sparse_emb_grad=True)
        losses = []
        for b in post:
            batch = dlrm.Batch(
                dense=b["dense"],
                indices=b["indices"][:, :, None].astype(np.int32),
                labels=b["labels"],
            )
            state, loss = step(state, batch)
            losses.append(float(loss))

        np.testing.assert_allclose(
            np.asarray(losses),
            np.asarray(ref_full["losses"][len(pre):]),
            rtol=5e-4,
            err_msg="continued-training trajectory diverges from the "
                    "reference counterfactual",
        )


class TestTorchImportTricks:
    """Importing a reference checkpoint whose tables are QR/MD compositional
    (upstream driver, tricks/qr_embedding_bag.py + md_embedding_bag.py):
    dict entries round-trip and the imported model reproduces the torch
    forward probabilities."""

    def _upstream_model(self, kind):
        import ref_runner

        up = ref_runner._import_reference_upstream()
        qr_cfg = DLRMConfig(
            table_sizes=(60, 30, 11, 5),
            embedding_dim=D,
            mlp_bot=(4, 12, D),
            mlp_top=(18, 8, 1),
            qr_flag=(kind == "qr"),
            qr_threshold=20,
            qr_collisions=4,
            md_flag=(kind == "md"),
            md_threshold=3,
            md_temperature=0.3,
            md_round_dims=True,
        )
        import contextlib
        import io

        import numpy as _np

        with contextlib.redirect_stdout(io.StringIO()):
            model = up.DLRM_Net(
                _np.asarray(qr_cfg.md_dims()) if kind == "md" else D,
                _np.array([60, 30, 11, 5]),
                _np.array([4, 12, D]),
                _np.array([18, 8, 1]),
                arch_interaction_op="dot",
                sigmoid_bot=-1,
                sigmoid_top=1,
                qr_flag=(kind == "qr"),
                qr_operation="mult",
                qr_collisions=4,
                qr_threshold=20,
                md_flag=(kind == "md"),
                md_threshold=3,
                loss_function="bce",
            )
        return model, qr_cfg

    @pytest.mark.parametrize("kind", ["qr", "md"])
    def test_trick_checkpoint_roundtrip(self, kind, tmp_path):
        import torch

        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            init_train_state,
            make_eval_step,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint import (
            load_checkpoint,
        )

        model, cfg = self._upstream_model(kind)
        pt = tmp_path / f"{kind}.pt"
        torch.save({"state_dict": model.state_dict()}, pt)
        out = tmp_path / f"{kind}.npz"
        arch = import_torch_checkpoint(str(pt), str(out))
        assert arch["table_kinds"][0] == kind
        # qr: only tables above the threshold are compositional; md uses
        # threshold 3, so ALL tables are mixed-dim (the reference's
        # create_emb else-branch cannot take the per-table dim array)
        assert arch["table_kinds"][2] == ("dense" if kind == "qr" else "md")

        # the importer's inferred QR table size is the ceil(n/c)*c upper
        # bound; use its own arch to build the loading config
        import dataclasses

        load_cfg = dataclasses.replace(
            cfg,
            table_sizes=arch["table_sizes"],
            qr_threshold=20 if kind == "qr" else cfg.qr_threshold,
        )
        tc = TrainConfig(batch_size=8)
        state, _ = load_checkpoint(str(out), init_train_state(load_cfg, tc))

        # forward parity on a random batch (indices within the TRUE sizes)
        rng = np.random.RandomState(7)
        B, P = 8, 1
        idx = np.stack(
            [rng.randint(0, n, size=(B, P)) for n in (60, 30, 11, 5)]
        ).astype(np.int32)
        dense = rng.uniform(0, 1, size=(B, 4)).astype(np.float32)
        batch = dlrm.Batch(
            dense=dense, indices=idx, labels=np.zeros(B, np.float32)
        )
        ours = np.asarray(make_eval_step(load_cfg)(state, batch))

        lS_i = [torch.tensor(idx[t].reshape(-1).astype(np.int64)) for t in range(4)]
        lS_o = [torch.tensor(np.arange(B, dtype=np.int64) * P)] * 4
        theirs = (
            model(torch.tensor(dense), lS_o, lS_i).detach().numpy().reshape(-1)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
