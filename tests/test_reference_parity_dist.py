"""Multi-replica reference A/B: the ACTUAL reference running 2-process gloo
(dlrm_s_pytorch_comm_grad.py world_size=2) vs our compressed-gradient DP step
on a 2-device mesh, identical inits and batches.

This validates the CROSS-REPLICA parts of the exchange that the world_size=1
case cannot: scale all-reduce + averaging across ranks with DIFFERENT local
gradients (quantize_emb_grad / quantize_linear_grad parallel=True,
sgd_quantized_gradients_parallel_comm.py:850-961), integer-sum all-reduce,
and the /world normalization at apply.
"""

import dataclasses
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm

from ref_runner import have_reference

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not have_reference(), reason="reference checkout not available"
    ),
]

TABLE_SIZES = (60, 30, 11, 5)
D = 8
B = 16
N_STEPS = 10
LR = 0.05
WORLD = 2


def _make_batches(n_steps, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        out.append(
            {
                "dense": rng.uniform(0, 1, size=(B, 4)).astype(np.float32),
                "indices": np.stack(
                    [rng.randint(0, n, size=B) for n in TABLE_SIZES]
                ).astype(np.int64),
                "labels": (rng.uniform(size=B) < 0.5).astype(np.float32),
            }
        )
    return out


class TestCommGradWorld2:
    def test_commgrad_world2_trajectory_matches(self, tmp_path):
        cfg = DLRMConfig(
            table_sizes=TABLE_SIZES,
            embedding_dim=D,
            mlp_bot=(4, 16, D),
            mlp_top=(18, 12, 1),
            quant=QuantConfig(
                enabled=True, embedding_bit=4, weight_bit=4, bias_bit=4,
                quantize_mlp=True, scale_update_period=1,
            ),
        )
        tc = TrainConfig(
            batch_size=B, learning_rate=LR, seed=5,
            grad_quant_bits=8, weight_sync_period=0,
        )
        batches = _make_batches(N_STEPS)
        params0 = dlrm.init_params(cfg, tc.seed)
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

        data_path = tmp_path / "data.pkl"
        with open(data_path, "wb") as f:
            pickle.dump(
                {
                    "weights": weights,
                    "batches": batches,
                    "lr": LR,
                    "mode": "full4",
                    "embedding_bit": 4,
                    "weight_bit": 4,
                    "grad_bits": 8,
                },
                f,
            )

        # --- reference: 2 gloo processes (torch only, no JAX) ---
        worker = os.path.join(os.path.dirname(__file__), "ref_commgrad_worker.py")
        port = 29815
        procs, outs = [], []
        for r in range(WORLD):
            out_path = tmp_path / f"out_rank{r}.pkl"
            outs.append(out_path)
            procs.append(
                subprocess.Popen(
                    [sys.executable, worker, str(r), str(WORLD), str(port),
                     str(data_path), str(out_path)],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                )
            )
        for p in procs:
            out, _ = p.communicate(timeout=300)
            assert p.returncode == 0, out.decode()[-3000:]
        refs = []
        for o in outs:
            with open(o, "rb") as f:
                refs.append(pickle.load(f))

        # replicas must agree with each other (symmetric exchange)
        for a, b in zip(refs[0]["params"]["emb"], refs[1]["params"]["emb"]):
            np.testing.assert_allclose(a, b, atol=1e-6)

        # --- ours: 2-device mesh, same full batches ---
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            comm_grad,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import (
            make_mesh,
        )

        mesh = make_mesh(WORLD)
        state = comm_grad.init_dp_state(cfg, tc)
        state = state._replace(params={**state.params, "emb": params0["emb"],
                                       "bot": params0["bot"],
                                       "top": params0["top"]})
        step = comm_grad.make_dp_train_step(cfg, tc, mesh)
        losses = []
        for b in batches:
            batch = dlrm.Batch(
                dense=b["dense"],
                indices=b["indices"][:, :, None].astype(np.int32),
                labels=b["labels"],
            )
            state, loss = step(state, batch)
            losses.append(float(loss))

        ref_mean_losses = np.mean(
            [refs[0]["losses"], refs[1]["losses"]], axis=0
        )
        np.testing.assert_allclose(
            np.asarray(losses), ref_mean_losses, rtol=5e-4,
            err_msg="per-step mean loss mismatch [commgrad world=2]",
        )
        ours = state.params
        refp = refs[0]["params"]
        for a, b in zip(ours["emb"], refp["emb"]):
            np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)
        for part in ("bot", "top"):
            for la, lb in zip(ours[part], refp[part]):
                np.testing.assert_allclose(np.asarray(la["w"]), lb["w"], atol=2e-4)
                np.testing.assert_allclose(np.asarray(la["b"]), lb["b"], atol=2e-4)
