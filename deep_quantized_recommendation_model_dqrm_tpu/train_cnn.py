"""CNN quantized-gradient training driver (ImageNet side-harness CLI).

TPU analogue of `training_imagenet_speedup.py`'s argparse surface + main
loop (:30-107, :472-584): trains the quantized CNN family
(`models/cnn.py`) under data parallelism with the top-k row-sparsified
gradient all-reduce (`parallel/topk_grad.py`). Image folders are replaced
by the learnable class-conditional synthetic generator (no image datasets
in this environment); the distributed algorithm, k schedule, and metrics
are the point of the harness, exactly as in the reference.

    python -m deep_quantized_recommendation_model_dqrm_tpu.train_cnn \
        --arch=32-64-128 --batch-size=256 --steps=200 --top-k=64 \
        --mode=gather --k-schedule=cifar10
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List

import jax
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.models import cnn
from deep_quantized_recommendation_model_dqrm_tpu.parallel import topk_grad
from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import make_mesh


def dash_ints(s: str) -> List[int]:
    return [int(x) for x in s.split("-")]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Quantized-gradient CNN training")
    # arch (reference -a/--arch picks a torchvision model; here the stack)
    p.add_argument("--arch", type=dash_ints, default=[32, 64, 128])
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--no-quant", action="store_true")
    p.add_argument("--no-bn", action="store_true")
    # training (training_imagenet_speedup.py:40-60)
    p.add_argument("-b", "--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=200, help="total train steps")
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--wd", "--weight-decay", type=float, default=0.0, dest="wd")
    p.add_argument("-p", "--print-freq", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    # top-k sync (reference --top_k / --metric / get_k_value schedule)
    p.add_argument("--top-k", type=int, default=32)
    p.add_argument("--mode", choices=["mask", "gather"], default="mask")
    p.add_argument("--metric", choices=["norm", "hessian"], default="norm",
                   help="row scoring: grad-norm or Hutchinson-trace-weighted "
                        "(training_imagenet_speedup.py --metric)")
    p.add_argument("--hessian-samples", type=int, default=8)
    p.add_argument("--k-schedule", choices=["none", "cifar10", "imagenet"],
                   default="none")
    p.add_argument("--num-devices", type=int, default=0,
                   help="0 = all visible devices")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = cnn.CNNConfig(
        image_size=args.image_size,
        channels=tuple(args.arch),
        num_classes=args.num_classes,
        bits=args.bits,
        quantize=not args.no_quant,
        batch_norm=not args.no_bn,
    )
    ndev = args.num_devices or len(jax.devices())
    mesh = make_mesh(ndev, axis_name="dp")
    if args.batch_size % ndev != 0:
        print(f"batch size {args.batch_size} not divisible by {ndev} devices",
              file=sys.stderr)
        return 2

    params = cnn.init_cnn_params(cfg, args.seed)
    state = topk_grad.init_topk_state(params, ndev)
    rs = np.random.RandomState(args.seed)

    def loss_fn(p, batch):
        imgs, labels = batch
        return cnn.cross_entropy_loss(cnn.cnn_forward(cfg, p, imgs, train=True), labels)

    # The k schedule / per-epoch Hessian trace rebuild the jitted step at
    # epoch boundaries only (the reference recomputes the trace each epoch,
    # training_imagenet_speedup.py:474-500; compile cache keyed by k when
    # the trace is static).
    steps = {}

    def step_for(k, trace=None):
        ck = (k, id(trace) if trace is not None else None)
        if ck not in steps:
            steps[ck] = topk_grad.make_topk_dp_train_step(
                loss_fn, mesh, k, args.lr, args.wd, axis="dp", mode=args.mode,
                trace=trace,
                batch_spec=(jax.sharding.PartitionSpec("dp"),
                            jax.sharding.PartitionSpec("dp")),
            )
        return steps[ck]

    total_epochs = max(1, args.steps // args.steps_per_epoch)
    t0 = time.perf_counter()
    loss = mb = None
    trace = None
    for i in range(args.steps):
        epoch = i // args.steps_per_epoch
        k = args.top_k
        if args.k_schedule != "none":
            k = topk_grad.get_k_value(args.top_k, epoch, total_epochs, args.k_schedule)
        if args.metric == "hessian" and i % args.steps_per_epoch == 0:
            timgs, tlabels = cnn.synthetic_image_batch(cfg, args.batch_size, rs)
            trace = topk_grad.estimate_row_trace(
                loss_fn, state.params, (timgs, tlabels),
                n_samples=args.hessian_samples,
                key=jax.random.PRNGKey(args.seed + epoch),
            )
        imgs, labels = cnn.synthetic_image_batch(cfg, args.batch_size, rs)
        state, (loss, mb) = step_for(k, trace)(state, (imgs, labels))
        if (i + 1) % args.print_freq == 0:
            print(f"step {i+1}: loss {float(loss):.4f}, synced {float(mb):.3f} Melem/it, "
                  f"k={k}, {(time.perf_counter()-t0)/(i+1)*1e3:.2f} ms/it")

    # Final eval on fresh synthetic batches (validate(), :586-629).
    eval_imgs, eval_labels = cnn.synthetic_image_batch(cfg, args.batch_size, rs)
    logits = jax.jit(lambda p, x: cnn.cnn_forward(cfg, p, x))(state.params, eval_imgs)
    acc = float(cnn.accuracy_topk(logits, eval_labels, 1))
    print(f"final: loss {float(loss):.4f}, top1 {acc*100:.2f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
