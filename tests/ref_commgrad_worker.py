"""Subprocess worker: one rank of a REAL 2-process reference commgrad run.

Drives the actual reference model + quantized-gradient exchange
(dlrm_s_pytorch_comm_grad.py loop semantics: per-rank batch slice ->
forward -> clear_gradients -> backward -> grad_update_parallel_comm ->
weight_update_parallel_comm, sgd_quantized_gradients_parallel_comm.py)
over torch.distributed gloo with world_size > 1 — the multi-replica
counterpart of ref_runner.run_reference(mode="commgrad") which only covers
world_size=1. Launched by
tests/test_reference_parity_dist.py; communicates via pickle files.

Usage: python ref_commgrad_worker.py RANK WORLD PORT DATA_PKL OUT_PKL
"""

import pickle
import sys


def main():
    rank, world, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_path, out_path = sys.argv[4], sys.argv[5]

    sys.path.insert(0, "/root/repo/tests")
    import ref_runner

    ref = ref_runner._import_reference()
    import torch
    import torch.distributed as dist

    from sgd_quantized_gradients_parallel_comm import (
        clear_gradients,
        grad_update_parallel_comm,
        weight_update_parallel_comm,
    )

    with open(data_path, "rb") as f:
        data = pickle.load(f)
    weights, batches, lr = data["weights"], data["batches"], data["lr"]
    mode = data.get("mode", "full4")
    eb, wb = data.get("embedding_bit", 4), data.get("weight_bit", 4)
    grad_bits = data.get("grad_bits", 8)

    dist.init_process_group(
        "gloo",
        init_method=f"tcp://127.0.0.1:{port}",
        world_size=world,
        rank=rank,
    )

    torch.manual_seed(0)
    model = ref_runner._build_model(ref, weights, mode, eb, wb)

    losses = []
    B = batches[0]["dense"].shape[0]
    mb = B // world
    sl = slice(rank * mb, (rank + 1) * mb)
    import contextlib
    import io

    for b in batches:
        dense = torch.tensor(b["dense"][sl])
        lS_i = [torch.tensor(b["indices"][k][sl]) for k in range(len(b["indices"]))]
        lS_o = [torch.arange(mb) for _ in lS_i]
        labels = torch.tensor(b["labels"][sl]).view(-1, 1)
        with contextlib.redirect_stdout(io.StringIO()):
            Z = model(dense, lS_o, lS_i)
            E = model.loss_fn(Z, labels)
            losses.append(float(E.detach()))
            clear_gradients(model)
            E.backward()
            grad_update_parallel_comm(
                model, world,
                emb_grad_quantized=True, num_bits=grad_bits,
                ranking_range=False,
            )
            weight_update_parallel_comm(
                model, lr,
                emb_grad_quantized=True, update_embedding=True, num_gpus=world,
            )

    out = {
        "losses": losses,
        "params": ref_runner._extract_params(model, quantized=(mode != "fp32")),
    }
    with open(out_path, "wb") as f:
        pickle.dump(out, f)
    dist.barrier()
    dist.destroy_process_group()


if __name__ == "__main__":
    main()
