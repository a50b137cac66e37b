"""Two-process jax.distributed smoke test on CPU — exercises
`multihost.init_distributed` beyond its single-host no-op path (the
analogue of the reference's process-group smoke tests,
python_profiling_script/example_multiple_cpu_dp.py + the launcher env
handling of extend_distributed.py:74-132).

Run:  python scripts/multihost_smoke.py
It re-execs itself as 2 worker processes (4 virtual CPU devices each),
initializes the 2-process JAX runtime through init_distributed's env-var
path (RANK/WORLD_SIZE/COORDINATOR_ADDRESS), builds a GLOBAL 8-device mesh
spanning both processes, assembles a global batch from per-host shards
(make_global_batch + local_batch_slice), and runs one compressed-gradient
DP train step — asserting both processes agree on the loss.
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("SMOKE_PORT", "12355"))


def worker(rank: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from deep_quantized_recommendation_model_dqrm_tpu.parallel.multihost import (
        init_distributed,
        local_batch_slice,
        make_global_batch,
    )

    # env-var path: RANK / WORLD_SIZE / COORDINATOR_ADDRESS (set by launcher)
    pid, pcount = init_distributed()
    assert pcount == 2, f"expected 2 processes, got {pcount}"
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from deep_quantized_recommendation_model_dqrm_tpu.config import (
        DLRMConfig,
        TrainConfig,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
        random_batch,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
    from deep_quantized_recommendation_model_dqrm_tpu.parallel import comm_grad
    from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import make_mesh

    cfg = DLRMConfig(
        table_sizes=(64, 40, 9),
        embedding_dim=8,
        mlp_bot=(4, 16, 8),
        mlp_top=(14, 8, 1),
    )
    tc = TrainConfig(batch_size=32, learning_rate=0.05)
    mesh = make_mesh(8)  # spans BOTH processes (4 local + 4 remote devices)

    B = 32
    full = random_batch(cfg, B, np.random.RandomState(0))  # same on each host
    start, size = local_batch_slice(B)
    local = dlrm.Batch(
        dense=np.asarray(full.dense)[start : start + size],
        indices=np.asarray(full.indices)[:, start : start + size],
        labels=np.asarray(full.labels)[start : start + size],
        mask=None,
    )
    specs = dlrm.Batch(dense=P("mp"), indices=P(None, "mp"), labels=P("mp"), mask=None)
    gbatch = make_global_batch(local, mesh, specs)

    state = comm_grad.init_dp_state(cfg, tc)
    step = comm_grad.make_dp_train_step(cfg, tc, mesh)
    for _ in range(3):
        state, loss = step(state, gbatch)
    loss_v = float(loss)
    assert np.isfinite(loss_v)
    print(f"[rank {pid}/{pcount}] 3 dp-comm-grad steps OK, loss {loss_v:.6f}",
          flush=True)

    # drain in-flight collectives before switching executables (CPU backend
    # op-id collision gotcha, .claude/skills/verify/SKILL.md)
    jax.block_until_ready(state)

    # --- k=2 SCAN megastep across BOTH processes: the round-4 production
    # form (lax.scan inside shard_map, collectives in the scan body) must
    # rendezvous correctly across real process boundaries ---
    # stack at the HOST-SHARD level (np.asarray on a cross-process global
    # array is not addressable), then assemble the leading-[k] global batch
    stacked_local = dlrm.Batch(
        dense=np.stack([local.dense, local.dense]),
        indices=np.stack([local.indices, local.indices]),
        labels=np.stack([local.labels, local.labels]),
        mask=None,
    )
    sspecs = dlrm.Batch(
        dense=P(None, "mp"),
        indices=P(None, None, "mp"),
        labels=P(None, "mp"),
        mask=None,
    )
    gstacked = make_global_batch(stacked_local, mesh, sspecs)
    mstep = comm_grad.make_dp_train_step(cfg, tc, mesh, steps_per_dispatch=2)
    mstate, mloss = mstep(state, gstacked)
    mloss_v = float(mloss)
    assert np.isfinite(mloss_v)
    jax.block_until_ready(mstate)
    print(f"[rank {pid}/{pcount}] k=2 scan megastep OK, mloss {mloss_v:.6f}",
          flush=True)

    # --- hybrid phase: table-sharded mega-table + a2a over BOTH processes ---
    from deep_quantized_recommendation_model_dqrm_tpu.parallel import hybrid

    plan = hybrid.plan_table_sharding(cfg.table_sizes, 8)
    hstate = hybrid.init_hybrid_state(cfg, tc, mesh, plan)
    hstep = hybrid.make_hybrid_train_step(cfg, tc, mesh, plan)
    # the hybrid step consumes the FULL batch replicated on every device
    rep_specs = dlrm.Batch(dense=P(), indices=P(), labels=P(), mask=None)
    hbatch = make_global_batch(
        dlrm.Batch(
            dense=np.asarray(full.dense),
            indices=np.asarray(full.indices),
            labels=np.asarray(full.labels),
            mask=None,
        ),
        mesh,
        rep_specs,
    )
    for _ in range(3):
        hstate, hloss = hstep(hstate, hbatch)
    hloss_v = float(hloss)
    assert np.isfinite(hloss_v)
    jax.block_until_ready(hstate)
    print(f"[rank {pid}/{pcount}] 3 hybrid a2a steps OK, hloss {hloss_v:.6f}",
          flush=True)

    # --- hybrid k=2 SCAN megastep across the process boundary (round 5,
    # VERDICT r4 #5): the a2a collective inside the lax.scan body must
    # rendezvous across BOTH processes ---
    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
        stack_batches,
    )

    hstacked = make_global_batch(
        stack_batches(
            [
                dlrm.Batch(
                    dense=np.asarray(full.dense),
                    indices=np.asarray(full.indices),
                    labels=np.asarray(full.labels),
                    mask=None,
                )
            ]
            * 2
        ),
        mesh,
        dlrm.Batch(dense=P(), indices=P(), labels=P(), mask=None),
    )
    hmstep = hybrid.make_hybrid_train_step(
        cfg, tc, mesh, plan, steps_per_dispatch=2
    )
    hstate, hmloss = hmstep(hstate, hstacked)
    hmloss_v = float(hmloss)
    assert np.isfinite(hmloss_v)
    jax.block_until_ready(hstate)
    print(f"[rank {pid}/{pcount}] hybrid k=2 scan megastep OK, "
          f"hmloss {hmloss_v:.6f}", flush=True)

    # --- sharded Orbax save/restore across the process boundary: each
    # process writes/reads only its mega-table shards; the restored state
    # must continue training on the SAME trajectory ---
    from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
        restore_sharded,
        save_sharded,
    )

    ckpt_dir = os.environ["SMOKE_CKPT_DIR"]
    save_sharded(os.path.join(ckpt_dir, "hyb"), hstate, {"it": 7})
    cont_state, cont_loss = hstep(hstate, hbatch)  # counterfactual next step
    cont_v = float(cont_loss)
    jax.block_until_ready(cont_state)
    fresh = hybrid.init_hybrid_state(cfg, tc, mesh, plan, seed=99)
    restored, meta = restore_sharded(os.path.join(ckpt_dir, "hyb"), fresh)
    assert int(meta.get("it", -1)) == 7
    _, rest_loss = hstep(restored, hbatch)
    rest_v = float(rest_loss)
    assert rest_v == cont_v, (rest_v, cont_v)
    print(f"[rank {pid}/{pcount}] sharded orbax round-trip OK, "
          f"oloss {rest_v:.6f}", flush=True)


def launcher() -> int:
    import tempfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = tempfile.mkdtemp(prefix="smoke_hyb_ckpt_")
    env_base = {
        **os.environ,
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "WORLD_SIZE": "2",
        "COORDINATOR_ADDRESS": f"127.0.0.1:{PORT}",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        "SMOKE_CKPT_DIR": ckpt_dir,
    }
    procs = []
    for rank in range(2):
        env = {**env_base, "RANK": str(rank)}
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(rank)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    rc = 0
    outputs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outputs.append(out.decode())
        rc |= p.returncode
    for rank, out in enumerate(outputs):
        print(f"--- rank {rank} ---")
        print(out)
    losses = [
        line.split("loss ")[-1]
        for out in outputs
        for line in out.splitlines()
        if "steps OK, loss" in line
    ]
    hlosses = [
        line.split("hloss ")[-1]
        for out in outputs
        for line in out.splitlines()
        if "steps OK, hloss" in line
    ]
    mlosses = [
        line.split("mloss ")[-1]
        for out in outputs
        for line in out.splitlines()
        if "scan megastep OK, mloss" in line
    ]
    hmlosses = [
        line.split("hmloss ")[-1]
        for out in outputs
        for line in out.splitlines()
        if "hybrid k=2 scan megastep OK" in line
    ]
    olosses = [
        line.split("oloss ")[-1]
        for out in outputs
        for line in out.splitlines()
        if "sharded orbax round-trip OK" in line
    ]
    import shutil

    shutil.rmtree(ckpt_dir, ignore_errors=True)
    if (
        rc == 0
        and len(losses) == 2 and losses[0] == losses[1]
        and len(hlosses) == 2 and hlosses[0] == hlosses[1]
        and len(mlosses) == 2 and mlosses[0] == mlosses[1]
        and len(hmlosses) == 2 and hmlosses[0] == hmlosses[1]
        and len(olosses) == 2 and olosses[0] == olosses[1]
    ):
        print("MULTIHOST SMOKE OK: both ranks agree, dp loss", losses[0],
              "scan-megastep loss", mlosses[0], "hybrid loss", hlosses[0],
              "hybrid-scan loss", hmlosses[0], "orbax loss", olosses[0])
        return 0
    print("MULTIHOST SMOKE FAILED", rc, losses, hlosses, mlosses,
          hmlosses, olosses)
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        sys.exit(launcher())
