"""Two-process CLI smoke: the full train.py driver launched as a real
multi-process jax.distributed run on CPU (4 virtual devices per process,
8-device global mesh) — the analogue of the reference's mp.spawn/-n/-g/-nr
launch of dlrm_s_pytorch_comm_grad.py:1159-1168.

Run:  python scripts/multihost_cli_smoke.py
It re-execs itself as 2 worker processes that each call train.run() with
--parallelism=dp; init_distributed picks up RANK/WORLD_SIZE/
COORDINATOR_ADDRESS from env, every process feeds its host slice of the
batch (train.globalize_batch), and rank 0 prints the training log.
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("SMOKE_PORT", "12515"))


_MODES = {
    "dp": ["--parallelism=dp", "--grad-quant-bits=8", "--weight-sync-period=0"],
    # table-sharded mega-table spanning BOTH processes + all-to-all over DCN
    "hybrid": ["--parallelism=hybrid", "--grad-quant-bits=32"],
}


def worker() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deep_quantized_recommendation_model_dqrm_tpu.train import run

    mode = os.environ["SMOKE_MODE"]
    m = run([
        "--platform=cpu",
        "--data-generation=random",
        "--arch-embedding-size=64-40-9",
        "--arch-sparse-feature-size=8",
        "--arch-mlp-bot=4-16-8",
        "--arch-mlp-top=14-8-1",
        "--mini-batch-size=32",
        "--num-batches=12",
        "--print-freq=4",
        "--test-freq=8",
    ] + _MODES[mode])
    assert "roc_auc" in m, m
    print(f"[rank {os.environ['RANK']}] CLI {mode} run done: {m}", flush=True)


def launcher() -> None:
    for i, mode in enumerate(_MODES):
        procs = []
        for rank in range(2):
            env = {
                **os.environ,
                "RANK": str(rank),
                "WORLD_SIZE": "2",
                "COORDINATOR_ADDRESS": f"127.0.0.1:{PORT + i}",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "SMOKE_WORKER": "1",
                "SMOKE_MODE": mode,
            }
            procs.append(
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                )
            )
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        for r, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                print(f"--- {mode} rank {r} output ---\n{out}")
                raise SystemExit(f"{mode} rank {r} exited {p.returncode}")
        assert f"CLI {mode} run done" in outs[0], outs[0]
        print(outs[0])
    print("MULTIHOST CLI SMOKE OK")


if __name__ == "__main__":
    if os.environ.get("SMOKE_WORKER"):
        worker()
    else:
        launcher()
