"""Long-horizon reference A/B (VERDICT r4 #7): 2000 SGD steps of the
full-INT4 QAT config, our engine vs the in-process torch reference on
identical init + batches. Records the per-step relative loss divergence
curve to artifacts/long_ab_divergence.csv.

Usage: python scripts/long_ab.py [n_steps]   (CPU only, ~2-4 min)
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    init_train_state,
    make_train_step,
)

from ref_runner import run_reference  # noqa: E402

TABLE_SIZES = (60, 30, 11, 5)
B = 16
LR = 0.05


def main(n_steps: int = 2000) -> None:
    cfg = DLRMConfig(
        table_sizes=TABLE_SIZES,
        embedding_dim=8,
        mlp_bot=(4, 16, 8),
        mlp_top=(18, 12, 1),
        quant=QuantConfig(
            enabled=True, embedding_bit=4, weight_bit=4, bias_bit=4,
            quantize_mlp=True, scale_update_period=1,
        ),
    )
    tc = TrainConfig(batch_size=B, learning_rate=LR, seed=5)
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(n_steps):
        idx = np.stack(
            [rng.randint(0, n, size=B) for n in TABLE_SIZES]
        ).astype(np.int64)
        batches.append({
            "dense": rng.uniform(0, 1, size=(B, 4)).astype(np.float32),
            "indices": idx,
            "labels": (rng.uniform(size=B) < 0.5).astype(np.float32),
        })

    params0 = dlrm.init_params(cfg, tc.seed)
    w = {
        "emb": [np.asarray(t) for t in params0["emb"]],
        "bot": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
                for l in params0["bot"]],
        "top": [{"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
                for l in params0["top"]],
    }
    t0 = time.time()
    ref = run_reference(w, batches, lr=LR, mode="full4",
                        embedding_bit=4, weight_bit=4)
    t_ref = time.time() - t0

    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc, sparse_emb_grad=True)
    ours = []
    t0 = time.time()
    for b in batches:
        state, loss = step(
            state,
            dlrm.Batch(
                dense=b["dense"],
                indices=b["indices"][:, :, None].astype(np.int32),
                labels=b["labels"],
            ),
        )
        ours.append(float(loss))
    t_ours = time.time() - t0

    ours = np.asarray(ours)
    refs = np.asarray(ref["losses"])
    rel = np.abs(ours - refs) / np.maximum(np.abs(refs), 1e-12)
    import os

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/long_ab_divergence.csv", "w") as f:
        f.write("step,ours,ref,rel_diff\n")
        for i in range(n_steps):
            f.write(f"{i},{ours[i]:.8f},{refs[i]:.8f},{rel[i]:.3e}\n")
    print(f"steps={n_steps} t_ref={t_ref:.1f}s t_ours={t_ours:.1f}s")
    print(f"max rel diff = {rel.max():.3e} at step {int(rel.argmax())}")
    for hi in (100, 500, 1000, 2000):
        if hi <= n_steps:
            print(f"  max rel diff over first {hi}: {rel[:hi].max():.3e}")
    print(f"final losses: ours {ours[-1]:.6f} ref {refs[-1]:.6f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
