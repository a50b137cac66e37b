"""CLI training driver — one config-driven entry point replacing the
reference's 20 near-clone `dlrm_s_pytorch*.py` scripts.

Run:  python -m deep_quantized_recommendation_model_dqrm_tpu.train \
        --data-generation=random --num-batches=100 ...

The argparse surface mirrors the reference (dlrm_s_pytorch.py:907-1021 +
QAT flags comm_grad.py:1120-1137); the loop mirrors the canonical driver
(dlrm_s_pytorch.py:1501-1781): per-epoch batch loop, `--print-freq` loss
prints with ms/it, `--test-freq` eval with best-checkpoint save, resume.

Parallelism (`--parallelism`):
  none          single chip (default)
  dp            data-parallel with DQRM compressed gradient exchange
                (the comm_grad drivers)
  dp-nosync     local-SGD ablation: replicas never sync gradients
                (dlrm_s_pytorch_dp_only.py)
  hybrid        table-sharded embeddings + all-to-all + DP MLPs
                (the hybrid_multi_gpu / quantization_tr_two drivers)
  rowshard      ROW-sharded mega-table + psum_scatter + DP MLPs — the
                TPU-native scaling extension (parallel/rowshard.py): a
                single giant table spans devices; any device count works
  pseudo        N simulated workers on one chip (pseudo_multigpu drivers)
`--steps-per-dispatch=K` unrolls K train steps into one jitted dispatch
(none/dp/hybrid) — numerically identical, amortizes host dispatch overhead.
Device count comes from the visible JAX devices (`jax.distributed` handles
multi-host); the pseudo-multigpu validation trick is
`XLA_FLAGS=--xla_force_host_platform_device_count=N` + --platform=cpu.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

# --stream-update-max-rows auto rule: OFF. Measured on v5e (2026-08-21,
# scripts/bench_stream_update.py + the tile sweep): the tile-streaming
# kernel moves ~4.2 ns per table row INDEPENDENT of tile size (~0.03 TB/s
# effective through the narrow-lane Pallas block pipeline — the (T, d=16)
# f32 blocks use 16 of 128 lanes at every stage), so it only edges out the
# coalesce+hints scatter in a narrow band (~7% at 93k rows, B=8192) and
# loses everywhere else. The always-on win is the pre-coalesced
# unique+sorted scatter (train_step._SORTED_SCATTER_MAX_ROWS). The flag
# stays for explicit experimentation.
_STREAM_AUTO_ROWS_PER_BATCH = 0

from deep_quantized_recommendation_model_dqrm_tpu.config import (
    DLRMConfig,
    QuantConfig,
    TrainConfig,
    dash_separated_ints,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native DQRM training")
    # architecture (dlrm_s_pytorch.py:909-930)
    p.add_argument("--arch-sparse-feature-size", type=int, default=16)
    p.add_argument("--arch-embedding-size", type=str, default="4-3-2")
    p.add_argument("--arch-mlp-bot", type=str, default="13-512-256-64-16")
    p.add_argument("--arch-mlp-top", type=str, default="512-256-1")
    p.add_argument("--arch-interaction-op", type=str, default="dot")
    p.add_argument("--arch-interaction-itself", action="store_true")
    p.add_argument("--loss-threshold", type=float, default=0.0)
    p.add_argument("--loss-function", type=str, default="bce",
                   choices=("mse", "bce", "wbce"))
    p.add_argument("--loss-weights", type=str, default="1.0-1.0",
                   help="wbce per-class weights w_neg-w_pos")
    # embedding compression tricks + weighted pooling
    # (dlrm_s_pytorch.py:922-931 + md_solver :1202)
    p.add_argument("--table-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="embedding master-table dtype (bfloat16 halves HBM)")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="MLP/interaction matmul dtype (bfloat16 = MXU-native "
                        "2x rate, fp32 master weights + accumulation)")
    p.add_argument("--weighted-pooling", type=str, default=None,
                   choices=[None, "fixed", "learned"])
    p.add_argument("--qr-flag", action="store_true")
    p.add_argument("--qr-operation", type=str, default="mult",
                   choices=["mult", "add", "concat"])
    p.add_argument("--qr-collisions", type=int, default=4)
    p.add_argument("--qr-threshold", type=int, default=200)
    p.add_argument("--md-flag", action="store_true")
    p.add_argument("--md-threshold", type=int, default=200)
    p.add_argument("--md-temperature", type=float, default=0.3)
    p.add_argument("--md-round-dims", action="store_true")
    # data (dlrm_s_pytorch.py:940-975)
    p.add_argument("--data-generation", type=str, default="random",
                   choices=["random", "learnable", "dataset", "binary"],
                   help="'learnable' = synthetic CTR stream WITH signal "
                        "(hidden factorization model, data/synthetic."
                        "LearnableSyntheticLoader) — the accuracy-gate "
                        "stand-in when real Criteo is unavailable; train "
                        "and test share the ground-truth model")
    p.add_argument("--data-set", type=str, default="kaggle",
                   choices=["kaggle", "terabyte"])
    p.add_argument("--processed-data-dir", type=str, default="")
    p.add_argument("--raw-data-file", type=str, default="")
    p.add_argument("--raw-data-files", type=str, default="",
                   help="comma-separated or glob list of per-day raw files "
                        "(Terabyte day_0..day_23); preprocessed in parallel "
                        "via preprocess_criteo_days_parallel")
    p.add_argument("--preprocess-workers", type=int, default=4)
    p.add_argument("--binary-data-file", type=str, default="")
    p.add_argument("--binary-test-data-file", type=str, default="",
                   help="separate mlperf bin file for eval (reference "
                        "test_data.bin); default: split --binary-data-file 7/8-1/8")
    p.add_argument("--max-ind-range", type=int, default=-1)
    p.add_argument("--data-sub-sample-rate", type=float, default=0.0)
    p.add_argument("--data-randomize", type=str, default="total",
                   choices=["total", "day", "none"],
                   help="train-sample shuffling (dlrm_s_pytorch.py:946): "
                        "day = shuffle within each day; total = also "
                        "shuffle day order (streaming stand-in for the "
                        "reference's preprocessing-time global reorder)")
    p.add_argument("--num-batches", type=int, default=0)
    p.add_argument("--data-size", type=int, default=0,
                   help="total synthetic samples; rounds up to whole batches "
                        "(RandomDataset, dlrm_data_pytorch.py:786-794). "
                        "--num-batches takes precedence when both are set")
    p.add_argument("--num-indices-per-lookup", type=int, default=1)
    # synthetic-data generation knobs (dlrm_s_pytorch.py:942-960 +
    # generate_dist_input_batch, dlrm_data_pytorch.py:1098-1158)
    p.add_argument("--num-indices-per-lookup-fixed",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="--no-…-fixed draws a per-lookup bag size in "
                        "[1, num-indices-per-lookup] (masked static-P "
                        "layout; the reference's offset encoding)")
    p.add_argument("--rand-data-dist", type=str, default="uniform",
                   choices=["uniform", "gaussian"],
                   help="gaussian draws INDICES from N(mu, sigma) clipped "
                        "to [rand-data-min, rand-data-max] (hot-index skew)")
    p.add_argument("--rand-data-min", type=float, default=0.0)
    p.add_argument("--rand-data-max", type=float, default=1.0)
    p.add_argument("--rand-data-mu", type=float, default=-1.0)
    p.add_argument("--rand-data-sigma", type=float, default=1.0)
    p.add_argument("--round-targets", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-round-targets keeps targets continuous U(0,1) "
                        "(the reference default — only meaningful with "
                        "--loss-function=mse)")
    p.add_argument("--data-trace-file", type=str, default="",
                   help="non-empty: draw sparse indices from per-table LRU "
                        "stack-distance profile files ('j' in the path is "
                        "replaced by the table index; "
                        "generate_synthetic_input_batch, dlrm_data_pytorch."
                        "py:1161-1233). If the table-0 file does not exist, "
                        "falls back to a GENERATED locality model "
                        "(data/synthetic.TraceSyntheticLoader). Build dist "
                        "files from a raw trace with data/trace."
                        "profile_trace_to_dist")
    p.add_argument("--data-trace-enable-padding", action="store_true",
                   help="pad the sampled stack-distance distribution once "
                        "all unique lines have been seen "
                        "(dlrm_data_pytorch.py:1241-1244)")
    p.add_argument("--mlperf-bin-shuffle", action="store_true",
                   help="batch-level shuffle of the mlperf binary train "
                        "split (RandomSampler, dlrm_data_pytorch.py:452)")
    p.add_argument("--mlperf-grad-accum-iter", type=int, default=1,
                   help="accumulate N batches into one optimizer step "
                        "(dlrm_s_pytorch.py:1595-1604); see "
                        "--grad-accum-semantics for the exact math")
    p.add_argument("--grad-accum-semantics", type=str, default="reference",
                   choices=["reference", "sum", "mean"],
                   help="'reference' reproduces the reference EXACTLY: its "
                        "zero_grad shares the step's (j+1)%%k==0 condition "
                        "(dlrm_s_pytorch.py:1596-1600), discarding the "
                        "first k-1 micro-grads — only the k-th batch's own "
                        "gradient is ever applied (A/B-verified). 'sum' = "
                        "sum of per-batch mean grads (concat + loss*k, the "
                        "accumulation the reference code apparently "
                        "intended); 'mean' = plain large-batch mean (concat)")
    p.add_argument("--documenting-table-weight", action="store_true",
                   help="dump embedding tables to <log-dir>/table_weights_"
                        "{0,1}.npz before/after training "
                        "(documenting_weights_tables, comm_grad.py:1699)")
    p.add_argument("--documenting-table-grads", type=int, default=0,
                   help="every N iterations dump the current batch's sparse "
                        "per-table embedding gradients (ids + row grads, "
                        "pre-update params) to <log-dir>/table_grads_it<N>."
                        "npz (the gradient half of the documenting driver, "
                        "dlrm_s_pytorch_single_gpu_documentingp.py:969-987; "
                        "analyze with tools/analysis.grad_distribution_"
                        "report). parallelism none/dp, single-process")
    # training (dlrm_s_pytorch.py:976-1003)
    p.add_argument("--mini-batch-size", type=int, default=128)
    p.add_argument("--test-mini-batch-size", type=int, default=16384)
    p.add_argument("--nepochs", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adagrad", "rwsadagrad"])
    p.add_argument("--lr-num-warmup-steps", type=int, default=0)
    p.add_argument("--lr-decay-start-step", type=int, default=0)
    p.add_argument("--lr-num-decay-steps", type=int, default=0)
    p.add_argument("--numpy-rand-seed", type=int, default=123)
    # control (dlrm_s_pytorch.py:1004-1021)
    p.add_argument("--print-freq", type=int, default=1024)
    p.add_argument("--test-freq", type=int, default=-1)
    p.add_argument("--val-freq", type=int, default=0,
                   help="evaluate on the VALIDATION split every this many "
                        "iterations; when > 0 best-checkpoint selection "
                        "uses val accuracy and test stays untouched for "
                        "final metrics (the reference builds val/test "
                        "halves, dlrm_data_pytorch.py:144-145, but its "
                        "drivers never consume val — this is the consumer). "
                        "dataset mode uses the second half of the last "
                        "day; synthetic modes derive a held-out loader")
    p.add_argument("--print-time", action="store_true")
    p.add_argument("--print-wall-time", action="store_true",
                   help="append HH:MM wall clock to the training print "
                        "(dlrm_s_pytorch.py:1636-1638)")
    p.add_argument("--save-model", type=str, default="")
    p.add_argument("--load-model", type=str, default="")
    p.add_argument("--inference-only", action="store_true")
    p.add_argument("--log-dir", type=str, default="")
    p.add_argument("--mlperf-logging", action="store_true")
    p.add_argument("--mlperf-acc-threshold", type=float, default=0.0)
    p.add_argument("--mlperf-auc-threshold", type=float, default=0.0)
    # quantization (comm_grad.py:1120-1137)
    p.add_argument("--quantization_flag", action="store_true")
    p.add_argument("--embedding_bit", type=int, default=4)
    p.add_argument("--weight_bit", type=int, default=4)
    p.add_argument("--bias_bit", type=int, default=32,
                   help="-1 = follow weight_bit (the reference hardcode)")
    p.add_argument("--activation_bit", type=int, default=8)
    p.add_argument("--interaction_bit", type=int, default=16)
    p.add_argument("--act-range-momentum", type=float, default=0.95,
                   help="-1 = running extremum (QuantAct act_range_momentum)")
    p.add_argument("--act-percentile", type=float, default=0.0)
    p.add_argument("--quantize_activation", action="store_true")
    p.add_argument("--quantize_act_and_lin", action="store_true")
    p.add_argument("--linear_channel", action="store_true")
    p.add_argument("--modify_feature_interaction", action="store_true")
    p.add_argument("--scale-update-period", type=int, default=200)
    p.add_argument("--quant-scheme", type=str, default="hawq",
                   choices=["hawq", "pact", "lsq"])
    p.add_argument("--pretrain_and_quantize", action="store_true")
    p.add_argument("--pretrain_and_quantize_lin", action="store_true")
    p.add_argument("--linear_shift_down_bit_width", action="store_true")
    p.add_argument("--shift-bit-width-to", type=int, default=4)
    # gradient communication (the DQRM contribution)
    p.add_argument("--parallelism", type=str, default="none",
                   choices=["none", "dp", "dp-nosync", "hybrid", "rowshard",
                            "pseudo"])
    p.add_argument("--grad-quant-bits", type=int, default=8,
                   help="gradient exchange bits (reference "
                        "--embedding_bag_gradient_bit_num); 32 = uncompressed")
    p.add_argument("--error-compensation", action="store_true")
    p.add_argument("--weight-sync-period", type=int, default=200)
    # ranking-range mixed-bit embedding-gradient policy (reference
    # --quantize_embedding_bag_gradient + grad_precision_and_scale,
    # sgd_quantized_gradients_parallel_comm.py:158-255)
    p.add_argument("--ranking-range", action="store_true")
    p.add_argument("--ranking-frac-hi", type=float, default=0.2)
    p.add_argument("--ranking-frac-int8", type=float, default=0.3)
    # INT-compressed all-to-all of pooled embeddings in the hybrid step
    p.add_argument("--a2a-quant-bits", type=int, default=32)
    # PTQ inference (dlrm_s_pytorch.py:1446-1471)
    p.add_argument("--quantize-emb-with-bit", type=int, default=32)
    p.add_argument("--quantize-mlp-with-bit", type=int, default=32)
    p.add_argument("--export-stablehlo", type=str, default="",
                   help="serialize the packed inference fn (the --save-onnx analogue)")
    # simulation / audit / profiling (SURVEY §3.4, §4.4, §5)
    p.add_argument("--num-pseudo-workers", type=int, default=4)
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="unroll N train steps into one jitted dispatch "
                        "(single-chip mode): amortizes host dispatch "
                        "overhead ~N-fold; numerically identical")
    p.add_argument("--onehot-lookup-max-rows", type=int, default=0,
                   help="tables with <= this many rows run the pooled "
                        "lookup as an MXU one-hot matmul instead of the "
                        "serial row gather (TPU-native; 0 disables)")
    p.add_argument("--onehot-update-max-rows", type=int, default=-1,
                   help="tables with <= this many rows apply sparse updates "
                        "as MXU one-hot dense grads instead of the "
                        "latency-bound serial scatter (TPU-native "
                        "optimization; 0 disables). Default -1 = auto: "
                        "20000 for the engines that support it (measured "
                        "optimum on v5e — 0.333 vs 0.421 ms/it at B=128 "
                        "Kaggle INT4 QAT, scripts/bench_onehot_megastep.py; "
                        "the next-larger Kaggle table, 93k rows, already "
                        "loses to the serial scatter), 0 elsewhere")
    p.add_argument("--stream-update-max-rows", type=int, default=-1,
                   help="SGD tables with onehot-update-max-rows < rows <= "
                        "this stream their sparse update through the "
                        "tile-streaming scatter-add kernel (sequential "
                        "full-table HBM traffic + per-tile MXU one-hot "
                        "matmuls) instead of the ~34 ns/row serial scatter "
                        "(TPU-native optimization; 0 disables). Default -1 "
                        "= auto = OFF: the measured v5e characterization "
                        "rejects streaming as a default (narrow ~7% win at "
                        "50-150k rows, B=8192 only; see "
                        "scripts/bench_stream_update.py) — the flag stays "
                        "for explicit experimentation")
    p.add_argument("--pin-table-layout", action="store_true",
                   help="pin embedding tables to row-major device layouts "
                        "(single-chip megastep): removes XLA's per-dispatch "
                        "layout-conversion copies at the cost of lane "
                        "padding at rest (rows pad to 128 lanes) — use for "
                        "wide-dim models (Terabyte d=64: OOM -> 9.3 ms/it)")
    # multi-process launch (the reference's -n/-g/-nr + MASTER_ADDR/PORT env,
    # dlrm_s_pytorch_comm_grad.py:1159-1167; rank discovery
    # extend_distributed.py:74-132). All three also read from env
    # (COORDINATOR_ADDRESS, WORLD_SIZE/NUM_PROCESSES, RANK/PROCESS_ID).
    p.add_argument("--coordinator-address", type=str, default="",
                   help="host:port of process 0 (multi-host jax.distributed)")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=-1)
    p.add_argument("--investigating-inputs", action="store_true")
    p.add_argument("--debug-mode", action="store_true")
    p.add_argument("--print-precision", type=int, default=5,
                   help="np.set_printoptions precision "
                        "(dlrm_s_pytorch.py:1061-1062)")
    p.add_argument("--plot-compute-graph", action="store_true",
                   help="dump the train step's lowered StableHLO to "
                        "<log-dir>/compute_graph.stablehlo.txt (the "
                        "torchviz analogue, dlrm_s_pytorch.py:1797-1803)")
    p.add_argument("--enable-profiling", action="store_true")
    p.add_argument("--profile-dir", type=str, default="/tmp/dqrm_trace")
    p.add_argument("--platform", type=str, default="")
    return p


def _day_sort_key(path: str):
    """Numeric-aware raw-day ordering: lexicographic sorting would put
    day_10 before day_2, misassigning raw days to npz day indices
    (Terabyte day_0..day_23 — the same ordering bug fixed in
    CriteoDataset's file listing)."""
    import re as _re

    nums = _re.findall(r"\d+", os.path.basename(path))
    return (int(nums[-1]) if nums else -1, path)


def _maybe_global_shuffle(args, day_paths):
    """--data-randomize=total at preprocessing time: a TRUE global reorder
    of the training rows across day files (the reference performs it while
    the whole concatenated set is resident, transformCriteoAdData
    data_utils.py:756-840; here it is a memory-bounded external shuffle,
    data/criteo.global_shuffle_days). The last day — the val/test split —
    keeps its temporal identity, like the reference's randomize of the
    train portion only."""
    if args.data_randomize != "total" or len(day_paths) < 2:
        return
    from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
        global_shuffle_days,
    )

    print(f"global shuffle of {len(day_paths) - 1} train day files")
    global_shuffle_days(day_paths[:-1], seed=args.numpy_rand_seed)


def make_configs(args) -> tuple:
    quant = QuantConfig(
        enabled=args.quantization_flag,
        embedding_bit=args.embedding_bit,
        weight_bit=args.weight_bit,
        # reference QAT drivers hardcode bias_bit = weight_bit
        # (comm_grad.py:316-323); -1 follows that, otherwise explicit
        bias_bit=args.weight_bit if args.bias_bit < 0 else args.bias_bit,
        activation_bit=args.activation_bit,
        quantize_activation=args.quantize_activation or args.quantize_act_and_lin,
        quantize_mlp=args.quantize_act_and_lin or args.weight_bit < 32,
        mlp_channelwise=args.linear_channel,
        modify_feature_interaction=args.modify_feature_interaction,
        interaction_bit=args.interaction_bit,
        scale_update_period=args.scale_update_period,
        act_range_momentum=args.act_range_momentum,
        act_percentile=args.act_percentile,
        quant_scheme=args.quant_scheme,
    )
    table_sizes = dash_separated_ints(args.arch_embedding_size)
    mlp_bot = dash_separated_ints(args.arch_mlp_bot)
    mlp_top = dash_separated_ints(args.arch_mlp_top)
    cfg = DLRMConfig(
        table_sizes=table_sizes,
        embedding_dim=args.arch_sparse_feature_size,
        mlp_bot=mlp_bot,
        mlp_top=mlp_top,
        interaction=args.arch_interaction_op,
        interact_itself=args.arch_interaction_itself,
        loss_threshold=args.loss_threshold,
        loss_function=args.loss_function,
        loss_weights=tuple(float(x) for x in args.loss_weights.split("-")),
        pooling_size=args.num_indices_per_lookup,
        max_ind_range=args.max_ind_range,
        weighted_pooling=args.weighted_pooling,
        qr_flag=args.qr_flag,
        qr_operation=args.qr_operation,
        qr_collisions=args.qr_collisions,
        qr_threshold=args.qr_threshold,
        md_flag=args.md_flag,
        md_threshold=args.md_threshold,
        md_temperature=args.md_temperature,
        md_round_dims=args.md_round_dims,
        table_dtype=args.table_dtype,
        compute_dtype=args.compute_dtype,
        onehot_lookup_max_rows=args.onehot_lookup_max_rows,
        quant=quant,
    )
    # derive ln_top input like the reference (dlrm_s_pytorch.py:1141-1164)
    if mlp_top[0] != cfg.top_input_dim:
        cfg = __import__("dataclasses").replace(
            cfg, mlp_top=(cfg.top_input_dim,) + mlp_top
        )
    tc = TrainConfig(
        batch_size=args.mini_batch_size,
        test_batch_size=args.test_mini_batch_size,
        nepochs=args.nepochs,
        learning_rate=args.learning_rate,
        optimizer=args.optimizer,
        lr_num_warmup_steps=args.lr_num_warmup_steps,
        lr_decay_start_step=args.lr_decay_start_step,
        lr_num_decay_steps=args.lr_num_decay_steps,
        print_freq=args.print_freq,
        print_wall_time=args.print_wall_time,
        test_freq=args.test_freq,
        seed=args.numpy_rand_seed,
        grad_quant_bits=args.grad_quant_bits,
        error_compensation=args.error_compensation,
        weight_sync_period=args.weight_sync_period,
        ranking_range=args.ranking_range,
        ranking_frac_hi=args.ranking_frac_hi,
        ranking_frac_int8=args.ranking_frac_int8,
        a2a_quant_bits=args.a2a_quant_bits,
        pretrain_epochs=1 if args.pretrain_and_quantize else 0,
        # reference epoch switches: MLP quantizes at k==2, bit shift at k==3
        # (comm_grad.py:1854-1856, :1870-1872)
        quantize_mlp_from_epoch=2 if args.pretrain_and_quantize_lin else -1,
        shift_bit_width_at_epoch=3 if args.linear_shift_down_bit_width else -1,
        shift_bit_width_to=args.shift_bit_width_to,
        onehot_update_max_rows=args.onehot_update_max_rows,
        stream_update_max_rows=args.stream_update_max_rows,
    )
    return cfg, tc


def make_loaders(args, cfg, tc):
    """Dataset dispatch (make_criteo_data_and_loaders /
    make_random_data_and_loader, dlrm_data_pytorch.py:423,897)."""
    from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
        RandomBatchLoader,
    )

    if args.data_generation == "random":
        nb = args.num_batches or (
            -(-args.data_size // tc.batch_size) if args.data_size > 0 else 128
        )
        if args.data_trace_file:
            # the trace generator has its own index model; the random-data
            # knobs below do not apply to it — reject rather than ignore
            if (
                args.rand_data_dist != "uniform"
                or not args.round_targets
                or not args.num_indices_per_lookup_fixed
            ):
                raise SystemExit(
                    "--data-trace-file is incompatible with --rand-data-dist/"
                    "--no-round-targets/--no-num-indices-per-lookup-fixed "
                    "(the trace generator defines its own index distribution)"
                )
            import os as _os

            from deep_quantized_recommendation_model_dqrm_tpu.data.trace import (
                TraceFileLoader,
                table_dist_path,
            )

            if _os.path.exists(table_dist_path(args.data_trace_file, 0)):
                # real per-table stack-distance profile files on disk:
                # replay them (generate_synthetic_input_batch,
                # dlrm_data_pytorch.py:1161-1233)
                train = TraceFileLoader(
                    cfg, tc.batch_size, nb, args.data_trace_file,
                    seed=tc.seed,
                    num_indices_per_lookup=args.num_indices_per_lookup,
                    enable_padding=args.data_trace_enable_padding,
                )
                test = TraceFileLoader(
                    cfg, tc.test_batch_size, max(1, nb // 8),
                    args.data_trace_file, seed=tc.seed + 1,
                    num_indices_per_lookup=args.num_indices_per_lookup,
                    enable_padding=args.data_trace_enable_padding,
                )
                return cfg, train, test, None
            # no such file: fall back to the generated LRU locality model
            from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
                TraceSyntheticLoader,
            )

            train = TraceSyntheticLoader(cfg, tc.batch_size, nb, seed=tc.seed)
            test = TraceSyntheticLoader(
                cfg, tc.test_batch_size, max(1, nb // 8), seed=tc.seed + 1
            )
            return cfg, train, test, None
        gen = dict(
            variable_pooling=not args.num_indices_per_lookup_fixed,
            rand_data_dist=args.rand_data_dist,
            rand_data_min=args.rand_data_min,
            rand_data_max=args.rand_data_max,
            rand_data_mu=args.rand_data_mu,
            rand_data_sigma=args.rand_data_sigma,
            round_targets=args.round_targets,
        )
        train = RandomBatchLoader(cfg, tc.batch_size, nb, seed=tc.seed, **gen)
        test = RandomBatchLoader(
            cfg, tc.test_batch_size, max(1, nb // 8), seed=tc.seed + 1, **gen
        )
        val = (
            RandomBatchLoader(
                cfg, tc.test_batch_size, max(1, nb // 8),
                seed=tc.seed + 104729, **gen
            )
            if args.val_freq > 0
            else None
        )
        return cfg, train, test, val
    if args.data_generation == "learnable":
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            LearnableSyntheticLoader,
        )

        nb = args.num_batches or (
            -(-args.data_size // tc.batch_size) if args.data_size > 0 else 128
        )
        train = LearnableSyntheticLoader(cfg, tc.batch_size, nb, seed=tc.seed)
        test = LearnableSyntheticLoader(
            cfg, tc.test_batch_size, max(1, nb // 8), seed=tc.seed + 7919
        )
        # held-out val stream for --val-freq best-checkpoint selection
        # (disjoint seed; same teacher as train/test so val AUC is a
        # meaningful selection signal)
        val = (
            LearnableSyntheticLoader(
                cfg, tc.test_batch_size, max(1, nb // 8),
                seed=tc.seed + 104729,
            )
            if args.val_freq > 0
            else None
        )
        return cfg, train, test, val
    if args.data_generation == "dataset":
        import os

        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            CriteoDataset,
            preprocess_criteo,
        )

        have_npz = os.path.exists(
            os.path.join(args.processed_data_dir, "day_0.npz")
        )
        if args.raw_data_files and not have_npz:
            # Terabyte flow: one raw file per day, preprocessed with per-day
            # worker parallelism (data_utils.py:1080-1290 semantics)
            import glob as _glob

            from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
                preprocess_criteo_days_parallel,
            )

            if "," in args.raw_data_files:
                day_files = args.raw_data_files.split(",")
            else:
                day_files = sorted(_glob.glob(args.raw_data_files), key=_day_sort_key)
            if not day_files:
                raise FileNotFoundError(
                    f"no raw day files match {args.raw_data_files!r}"
                )
            print(
                f"preprocessing {len(day_files)} day files -> "
                f"{args.processed_data_dir} ({args.preprocess_workers} workers)"
            )
            day_paths = preprocess_criteo_days_parallel(
                day_files,
                args.processed_data_dir,
                sub_sample_rate=args.data_sub_sample_rate,
                workers=args.preprocess_workers,
            )
            _maybe_global_shuffle(args, day_paths)
        elif args.raw_data_file and not have_npz:
            # preprocess-if-needed (CriteoDataset.__init__ behavior,
            # dlrm_data_pytorch.py:50-120 -> data_utils.getCriteoAdData)
            days = 7 if args.data_set == "kaggle" else 24
            print(f"preprocessing {args.raw_data_file} -> {args.processed_data_dir}")
            day_paths = preprocess_criteo(
                args.raw_data_file,
                args.processed_data_dir,
                num_days=days,
                sub_sample_rate=args.data_sub_sample_rate,
            )
            _maybe_global_shuffle(args, day_paths)
        train_ds = CriteoDataset(args.processed_data_dir, "train", args.max_ind_range)
        test_ds = CriteoDataset(args.processed_data_dir, "test", args.max_ind_range)
        sizes = train_ds.table_sizes
        cfg = __import__("dataclasses").replace(cfg, table_sizes=sizes)
        if cfg.mlp_top[0] != cfg.top_input_dim:
            cfg = __import__("dataclasses").replace(
                cfg, mlp_top=(cfg.top_input_dim,) + cfg.mlp_top[1:]
            )

        class _Iter:
            def __init__(self, ds, bs, randomize="none", seed=0):
                self.ds, self.bs = ds, bs
                self.randomize, self.seed = randomize, seed

            def __len__(self):
                return len(self.ds) // self.bs

            def __iter__(self):
                return self.ds.iter_batches(
                    self.bs,
                    shuffle_days=(self.randomize == "total"),
                    shuffle_rows=(self.randomize in ("total", "day")),
                    seed=self.seed,
                )

        # val = the second half of the last day (reference
        # dlrm_data_pytorch.py:144-145); exposed for early-stopping flows
        # even though the canonical drivers only consume train/test
        val_ds = CriteoDataset(args.processed_data_dir, "val", args.max_ind_range)
        return cfg, _Iter(
            train_ds, tc.batch_size, args.data_randomize, args.numpy_rand_seed
        ), _Iter(test_ds, tc.test_batch_size), _Iter(val_ds, tc.test_batch_size)
    # binary (mlperf format). The reference ships train/test as separate bin
    # files (dlrm_data_pytorch.py:441-461); with a single file we carve a
    # disjoint 7/8-1/8 record split so eval never sees training data.
    from deep_quantized_recommendation_model_dqrm_tpu.data.binary import (
        CriteoBinDataset,
    )

    if args.binary_test_data_file:
        train = CriteoBinDataset(
            args.binary_data_file, tc.batch_size, args.max_ind_range,
            shuffle=args.mlperf_bin_shuffle,
        )
        test = CriteoBinDataset(
            args.binary_test_data_file, tc.test_batch_size, args.max_ind_range
        )
    else:
        probe = CriteoBinDataset(args.binary_data_file, 1)
        n_train = (probe.num_samples * 7) // 8
        train = CriteoBinDataset(
            args.binary_data_file, tc.batch_size, args.max_ind_range,
            num_records=n_train, shuffle=args.mlperf_bin_shuffle,
        )
        test = CriteoBinDataset(
            args.binary_data_file, tc.test_batch_size, args.max_ind_range,
            start_record=n_train,
        )
    return cfg, train, test, None


def pad_eval(fn, ndev: int):
    """Wrap a sharded eval step so batch sizes not divisible by the mesh
    still evaluate: pad the batch to the next multiple of `ndev`, trim the
    returned probabilities. (The reference instead skips indivisible batches
    with a warning, dlrm_s_pytorch.py:789-791 — padding evaluates ALL data.)
    """
    from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch

    def wrapped(state, b):
        B = int(b.labels.shape[0])
        rem = B % ndev
        if rem == 0:
            return fn(state, b)
        pad = ndev - rem
        dense = np.asarray(b.dense)
        indices = np.asarray(b.indices)
        padded = Batch(
            dense=np.concatenate(
                [dense, np.zeros((pad, dense.shape[1]), dense.dtype)]
            ),
            indices=np.concatenate(
                [indices, np.zeros(indices.shape[:1] + (pad,) + indices.shape[2:], indices.dtype)],
                axis=1,
            ),
            labels=np.concatenate(
                [np.asarray(b.labels), np.zeros(pad, np.float32)]
            ),
            mask=None
            if b.mask is None
            else np.concatenate(
                [np.asarray(b.mask),
                 np.ones(b.mask.shape[:1] + (pad,) + b.mask.shape[2:], np.float32)],
                axis=1,
            ),
        )
        return np.asarray(fn(state, padded))[:B]

    return wrapped


def evaluate(cfg, state, test_loader, eval_fn, max_batches: Optional[int] = None):
    """Full-test-set metrics (inference(), dlrm_s_pytorch.py:762-902)."""
    from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import (
        binary_metrics,
    )

    scores, targets = [], []
    for i, b in enumerate(test_loader):
        if max_batches is not None and i >= max_batches:
            break
        # keep dispatches async; fetch once at the end (per-batch sync costs
        # 40ms+ on tunneled chips — see .claude/skills/verify)
        scores.append(eval_fn(state, b))
        targets.append(np.asarray(b.labels))
    if not scores:
        return {}
    scores = [np.asarray(s) for s in scores]
    return binary_metrics(np.concatenate(scores), np.concatenate(targets))


def run(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    np.set_printoptions(precision=args.print_precision)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    # Multi-process init BEFORE any backend touch (jax.distributed must run
    # first); no-op on a single host unless flags/env say otherwise.
    from deep_quantized_recommendation_model_dqrm_tpu.parallel.multihost import (
        init_distributed,
    )

    init_distributed(
        args.coordinator_address or None,
        args.num_processes or None,
        args.process_id if args.process_id >= 0 else None,
    )

    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    from deep_quantized_recommendation_model_dqrm_tpu.utils.logging import (
        MLPerfLogger,
        ScalarLogger,
        rank0_print,
    )

    np.random.seed(args.numpy_rand_seed)  # dlrm_s_pytorch.py:1060-1063
    if args.onehot_update_max_rows < 0:
        # auto: the measured v5e optimum for the engines that support the
        # one-hot dense-grad update; off where the flag would be rejected
        args.onehot_update_max_rows = (
            20000 if args.parallelism in ("none", "dp") else 0
        )
    if args.stream_update_max_rows < 0:
        # auto: off — the measured v5e characterization rejects streaming
        # as a default (see _STREAM_AUTO_ROWS_PER_BATCH above).
        args.stream_update_max_rows = _STREAM_AUTO_ROWS_PER_BATCH
    cfg, tc = make_configs(args)
    cfg, train_loader, test_loader, val_loader = make_loaders(args, cfg, tc)
    if args.val_freq > 0 and val_loader is None:
        raise SystemExit(
            "--val-freq needs a validation split; this data mode builds "
            "none (use --data-generation=dataset/random/learnable)"
        )
    cfg.validate_top()
    rank = jax.process_index()
    logger = ScalarLogger(args.log_dir or None)
    mll = MLPerfLogger(
        (args.log_dir + "/mlperf.jsonl") if (args.log_dir and args.mlperf_logging) else None,
        rank,
    )
    mll.start("init")

    if args.parallelism in ("hybrid", "rowshard", "pseudo") and (
        args.onehot_update_max_rows > 0 or args.onehot_lookup_max_rows > 0
        or args.stream_update_max_rows > 0
    ):
        # the mega-table engines (and the pseudo simulator) manage their own
        # gather/scatter layouts; the one-hot swaps apply to the single-chip
        # and dp engines only — reject loudly rather than silently ignore
        raise SystemExit(
            "--onehot-update-max-rows / --onehot-lookup-max-rows apply to "
            "parallelism none / dp / dp-nosync (dp-nosync: lookup flag "
            "only); the hybrid/rowshard mega-table scatter and the pseudo "
            "simulator do not take the one-hot path"
        )
    if args.parallelism == "dp-nosync" and args.stream_update_max_rows > 0:
        raise SystemExit(
            "--stream-update-max-rows: dp-nosync updates via dense "
            "autodiff; use parallelism none/dp for the streaming apply"
        )
    if args.parallelism == "dp-nosync" and args.onehot_update_max_rows > 0:
        raise SystemExit(
            "--onehot-update-max-rows: dp-nosync updates via dense "
            "autodiff; only --onehot-lookup-max-rows applies there"
        )
    if args.parallelism in ("hybrid", "rowshard"):
        # the mega-table state (hstate, below) owns the real model; a full
        # single-chip TrainState here would duplicate GBs of HBM — at
        # Terabyte scale the 6.3 GB of unused device tables OOM'd next to
        # the 12.6 GB pinned mega (round 5). 1-row placeholders keep every
        # later `state` reference structurally valid; all hybrid/rowshard
        # compute (train/eval/checkpoint/documenting) uses hstate.
        import dataclasses as _dcp

        state = init_train_state(
            _dcp.replace(cfg, table_sizes=(1,) * cfg.num_tables,
                         qr_flag=False, md_flag=False),
            tc,
        )
    else:
        state = init_train_state(cfg, tc)
    if args.pin_table_layout:
        if args.parallelism not in ("none", "dp", "hybrid"):
            raise SystemExit(
                "--pin-table-layout applies to the single-chip megastep, "
                "the dp engine, and the hybrid mega-table engine; "
                "rowshard manages its own layout"
            )
        if args.parallelism == "none":
            from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                pin_params_layout,
            )

            state = state._replace(params=pin_params_layout(state.params))
        # dp: the DP replica state is pinned after it is built below
    if args.debug_mode and args.parallelism in ("hybrid", "rowshard"):
        raise SystemExit(
            "--debug-mode prints the single-chip `state`, which is a "
            "placeholder for the mega-table engines; use "
            "--documenting-table-weight for their real tables"
        )
    if args.debug_mode:
        # arch + initial parameter printout (dlrm_s_pytorch.py:1210-1263)
        rank0_print(rank, f"model config: {cfg}")
        for part in ("bot", "top"):
            for li, l in enumerate(state.params[part]):
                w = np.asarray(l["w"])
                rank0_print(
                    rank,
                    f"{part}[{li}] w{w.shape} mean {w.mean():+.5f} std {w.std():.5f}",
                )
        for k, t in enumerate(state.params["emb"]):
            if isinstance(t, dict):  # QR/MD compositional entry
                for name, leaf in t.items():
                    leaf = np.asarray(leaf[: min(4, leaf.shape[0])])
                    rank0_print(rank, f"emb[{k}].{name} first rows:\n{leaf}")
            else:
                t = np.asarray(t[: min(4, t.shape[0])])
                rank0_print(rank, f"emb[{k}] first rows:\n{t}")
    # hybrid state checkpoints sharded via Orbax (the mega-table never
    # gathers to one device — Terabyte tables may not fit); other modes use
    # the npz two-slot manager
    if args.parallelism in ("hybrid", "rowshard"):
        from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
            ShardedCheckpointManager,
        )

        ckpt = ShardedCheckpointManager(args.save_model) if args.save_model else None
    else:
        # npz saves only on process 0 under multi-process launches (Orbax
        # above is collective — every process writes its own shards)
        ckpt = (
            CheckpointManager(args.save_model)
            if args.save_model and rank == 0
            else None
        )
    start_epoch = start_batch = 0
    best_acc = best_auc = 0.0
    # True architecture metadata rides every checkpoint we write, so QR/MD
    # models round-trip EXACTLY: a QREmbeddingBag state dict alone only
    # determines n up to the ceil(n/c)*c bound (tools/torch_import.py keeps
    # that bound because the reference's .pt genuinely lacks n — VERDICT r3
    # #7; reference state dict: tricks/qr_embedding_bag.py:140-149).
    arch_meta = {
        "table_sizes": [int(n) for n in cfg.table_sizes],
        "embedding_dim": int(cfg.embedding_dim),
        "mlp_bot": [int(x) for x in cfg.mlp_bot],
        "mlp_top": [int(x) for x in cfg.mlp_top],
        "table_kinds": [cfg.table_kind(k) for k in range(cfg.num_tables)],
    }
    if cfg.qr_flag:
        arch_meta.update(
            qr_collisions=int(cfg.qr_collisions),
            qr_operation=cfg.qr_operation,
            qr_threshold=int(cfg.qr_threshold),
        )
    if cfg.md_flag:
        arch_meta["md_threshold"] = int(cfg.md_threshold)
    if args.load_model and args.parallelism not in ("hybrid", "rowshard"):
        loaded = CheckpointManager(args.load_model)
        state, meta = loaded.restore(state)
        start_epoch = int(meta.get("epoch", 0))
        start_batch = int(meta.get("batch", 0))
        best_acc = float(meta.get("test_acc", 0.0))
        rank0_print(rank, f"resumed from {args.load_model} @ epoch {start_epoch} batch {start_batch}")

    if args.investigating_inputs:
        # data-integrity audit (comm_grad.py:1790-1830)
        from deep_quantized_recommendation_model_dqrm_tpu.tools.analysis import (
            audit_batches,
        )

        for name, loader in (("train", train_loader), ("test", test_loader)):
            rep = audit_batches(loader, cfg.table_sizes, cfg.num_dense,
                                max_batches=64)
            rank0_print(rank, f"input audit [{name}]: {rep}")

    eval_fn = make_eval_step(cfg)
    # mega-table engines: inference-only is DEFERRED until after the
    # sharded hstate is built/restored below (the `state` here is a 1-row
    # placeholder; before round 5 this path silently evaluated a FRESH
    # init and ignored --load-model entirely)
    if args.inference_only and args.parallelism not in ("hybrid", "rowshard"):
        if args.quantize_emb_with_bit in (4, 8):
            # PTQ serving path (quantize_embedding + quantize_dynamic,
            # dlrm_s_pytorch.py:1446-1471)
            from deep_quantized_recommendation_model_dqrm_tpu.serving import (
                export_stablehlo,
                make_serving_fn,
                ptq_export,
                serving_model_bytes,
            )

            sm = ptq_export(
                cfg,
                state.params,
                emb_bits=args.quantize_emb_with_bit,
                mlp_bits=args.quantize_mlp_with_bit if args.quantize_mlp_with_bit in (8,) else 32,
            )
            rank0_print(rank, f"PTQ model: {serving_model_bytes(sm)/1e6:.2f} MB")
            sfn = make_serving_fn(sm)
            if args.export_stablehlo:
                path = export_stablehlo(sm, tc.test_batch_size, args.export_stablehlo)
                rank0_print(rank, f"exported StableHLO to {path}")
            m = evaluate(cfg, state, test_loader, lambda s, b: sfn(b))
        else:
            m = evaluate(cfg, state, test_loader, eval_fn)
        rank0_print(rank, f"inference: {m}")
        return m

    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
        config_for_epoch,
    )

    step_mode = args.parallelism
    sync_fn = None
    plan = None
    dp_pin = None  # pinned-layout DPState template (--pin-table-layout dp)
    if step_mode in ("dp", "dp-nosync"):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import comm_grad
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        # build the dp state FROM the (possibly --load-model-restored)
        # train state: a fresh init_dp_state would both discard loaded
        # checkpoints and transiently double HBM at Terabyte scale
        dstate = comm_grad.dp_state_from(state.params, state.qstate)
        if args.pin_table_layout and step_mode == "dp":
            # row-major pinned table layouts for the dp engine (Terabyte-
            # scale models; see train_step.pin_params_layout). Takes
            # ownership of the tables — rebind `state` immediately.
            dstate = comm_grad.pin_dp_state_layout(dstate, mesh)
            state = state._replace(params=dstate.params, qstate=dstate.qstate)
            dp_pin = dstate
        # dp: periodic drift-bounding sync (weight_syncc, comm_grad.py:1977);
        # dp-nosync: the dp_only.py ablation has NO sync — we still build the
        # sync fn to re-average replicas before evaluation.
        sync_fn = comm_grad.make_weight_sync(
            mesh, pin_state_template=dp_pin
        ) if (
            tc.weight_sync_period > 0 or step_mode == "dp-nosync"
        ) else None
    elif step_mode == "pseudo":
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import pseudo

        pstate = pseudo.init_pseudo_state(cfg, tc)
    elif step_mode in ("hybrid", "rowshard"):
        from deep_quantized_recommendation_model_dqrm_tpu.parallel import (
            hybrid,
            rowshard,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if step_mode == "rowshard":
            plan = rowshard.plan_row_sharding(
                cfg.table_sizes,
                len(mesh.devices),
                kinds=tuple(cfg.table_kind(k) for k in range(cfg.num_tables)),
            )
            hstate = rowshard.init_rowshard_state(cfg, tc, mesh, plan)
        else:
            plan = hybrid.plan_table_sharding(
                cfg.table_sizes,
                len(mesh.devices),
                kinds=tuple(cfg.table_kind(k) for k in range(cfg.num_tables)),
            )
            pin_hybrid = args.pin_table_layout
            if pin_hybrid and args.load_model:
                # Orbax restore materializes a SECOND full mega next to the
                # `like` one, and a post-restore relayout needs compact +
                # padded copies — at Terabyte scale either pair exceeds
                # HBM. Resume pinned only when the mega is small enough to
                # double-buffer; otherwise reject with guidance.
                mega_bytes = sum(
                    n * cfg.embedding_dim
                    * (2 if cfg.table_dtype == "bfloat16" else 4)
                    for k, n in enumerate(cfg.table_sizes)
                    if cfg.table_kind(k) == "dense"
                )
                if mega_bytes > 4e9:
                    raise SystemExit(
                        "--pin-table-layout + --load-model (hybrid): the "
                        "Orbax restore + relayout would transiently hold "
                        "multiple full copies of a "
                        f"{mega_bytes/1e9:.1f} GB mega-table and exceed "
                        "HBM; resume without --pin-table-layout (slower "
                        "but correct), or use --parallelism=dp whose "
                        "per-table pinning restores safely"
                    )
            hstate = hybrid.init_hybrid_state(
                cfg, tc, mesh, plan,
                # when resuming, init unpinned (restore overwrites the
                # init values anyway) and pin AFTER restore — small
                # models only, guarded above
                pin_mega_layout=pin_hybrid and not args.load_model,
            )
        if args.load_model:
            from deep_quantized_recommendation_model_dqrm_tpu.utils.checkpoint_orbax import (
                ShardedCheckpointManager,
            )

            hstate, meta = ShardedCheckpointManager(args.load_model).restore(hstate)
            start_epoch = int(meta.get("epoch", 0))
            start_batch = int(meta.get("batch", 0))
            best_acc = float(meta.get("test_acc", 0.0))
            rank0_print(
                rank,
                f"resumed sharded hybrid state from {args.load_model} @ "
                f"epoch {start_epoch} batch {start_batch}",
            )
            if step_mode == "hybrid" and args.pin_table_layout:
                # pin the restored mega (small models — guarded above)
                hstate = hybrid.pin_mega_state(hstate, mesh)
        # (hybrid + --pin-table-layout fresh-init path: the mega is built
        # DIRECTLY in the pinned row-major layout —
        # hybrid.pack_tables_pinned_streaming — so no post-hoc relayout
        # is needed; the round-5 Terabyte-hybrid path, 4.7 ms/it vs 9.96)

    # Optional K-step megastep: one dispatch per K batches amortizes the
    # ~0.2 ms host dispatch overhead that otherwise dominates DQRM's ~10 us
    # device step (see train_step.make_multi_train_step). Supported for the
    # single-chip, dp and hybrid modes.
    multi_k = (
        max(1, args.steps_per_dispatch)
        if step_mode in ("none", "dp", "hybrid", "rowshard")
        else 1
    )
    accum_n = max(1, args.mlperf_grad_accum_iter)
    if accum_n > 1:
        if step_mode != "none":
            raise SystemExit(
                "--mlperf-grad-accum-iter requires --parallelism=none "
                "(the reference accumulates only in its single-process loop)"
            )
        multi_k = 1  # accumulation buffers batches; megastep disabled
        if args.grad_accum_semantics == "sum":
            # Sum-of-means: one step over the k-batch concat with the loss
            # scaled by k (see TrainConfig.loss_scale).
            tc = tc.replace(loss_scale=float(accum_n))
    if step_mode == "dp" and args.weight_sync_period > 0 and multi_k > 1:
        # align dispatches with weight_syncc boundaries: a megastep cannot
        # sync mid-dispatch, so clamp k to the largest divisor of the sync
        # period — otherwise syncs fire up to k-1 steps late (or skip a
        # boundary entirely when k > period)
        k = min(multi_k, args.weight_sync_period)
        while args.weight_sync_period % k:
            k -= 1
        if k != multi_k:
            rank0_print(
                rank,
                f"steps-per-dispatch {multi_k} -> {k} (aligning with "
                f"--weight-sync-period {args.weight_sync_period})",
            )
            multi_k = k

    # QAT epoch schedule: the jitted step is rebuilt (and cached) whenever
    # the effective config changes at an epoch boundary (comm_grad.py:
    # 1849-1872 — FP pretrain -> quantize -> MLP quantize -> bit shift).
    _step_cache = {}

    def _sparse_ok(eff):
        # explicit-sparse embedding updates guarantee O(touched rows)
        # update cost (see train_step._build_sparse_step_fn). All three
        # quant schemes qualify: hawq/lsq quantize the pooled OUTPUT and
        # pact's DoReFa STE is identity over the whole weight transform,
        # so d loss/d table == scatter(g_pooled) exactly
        # (tests/test_model.py::test_sparse_step_matches_dense_for_schemes).
        # QR/MD trick tables and learned pooling no longer force the dense
        # body: the sparse step differentiates trick recomputes and applies
        # analytic sparse v_W grads (exact-equivalence tests in
        # tests/test_model.py::TestSparseStepTricks).
        return tc.optimizer in ("sgd", "adagrad", "rwsadagrad")

    # any P>1 synthetic batch ships a [T, B, P] mask (variable pooling
    # lengths and/or in-bag dedupe — random_batch; trace-REPLAY bags are
    # np.unique'd so they are masked too); the generated locality model
    # (TraceSyntheticLoader) is the one mask-free P>1 source
    if args.data_trace_file:
        import os as _os

        from deep_quantized_recommendation_model_dqrm_tpu.data.trace import (
            table_dist_path,
        )

        _trace_replay = _os.path.exists(
            table_dist_path(args.data_trace_file, 0)
        )
    else:
        _trace_replay = False
    has_mask = (
        args.data_generation == "random"
        and args.num_indices_per_lookup > 1
        and (not args.data_trace_file or _trace_replay)
    )

    def get_step(epoch: int, k: Optional[int] = None):
        """Jitted step for `epoch`; k>1 gives the k-batch megastep."""
        k = multi_k if k is None else k
        eff = config_for_epoch(cfg, tc, epoch)
        key = (eff, k)
        if key not in _step_cache:
            if step_mode == "dp":
                _step_cache[key] = comm_grad.make_dp_train_step(
                    eff, tc, mesh, has_mask=has_mask, steps_per_dispatch=k,
                    pin_state_template=dp_pin,
                )
            elif step_mode == "dp-nosync":
                _step_cache[key] = comm_grad.make_dp_nosync_train_step(
                    eff, tc, mesh, has_mask=has_mask
                )
            elif step_mode == "hybrid":
                _step_cache[key] = hybrid.make_hybrid_train_step(
                    eff, tc, mesh, plan, has_mask=has_mask,
                    steps_per_dispatch=k,
                    pin_mega_layout=args.pin_table_layout,
                )
            elif step_mode == "rowshard":
                _step_cache[key] = rowshard.make_rowshard_train_step(
                    eff, tc, mesh, plan, has_mask=has_mask, steps_per_dispatch=k
                )
            elif step_mode == "pseudo":
                _step_cache[key] = pseudo.make_pseudo_train_step(
                    eff, tc, args.num_pseudo_workers
                )
            elif k > 1:
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    jit_with_pinned_tables,
                    make_multi_train_step,
                )

                if args.pin_table_layout:
                    # row-major table layouts: no boundary relayout copies
                    # (see train_step.pin_params_layout; the state was
                    # pinned after init). Memory cost: rows pad to 128
                    # lanes — use for wide-dim (d>=64) models.
                    _step_cache[key] = jit_with_pinned_tables(
                        make_multi_train_step(
                            eff, tc, k,
                            sparse_emb_grad=_sparse_ok(eff), _jit=False,
                        ),
                        state,
                    )
                else:
                    _step_cache[key] = make_multi_train_step(
                        eff, tc, k, sparse_emb_grad=_sparse_ok(eff)
                    )
            else:
                _step_cache[key] = make_train_step(
                    eff, tc, sparse_emb_grad=_sparse_ok(eff)
                )
            if eff is not cfg:
                rank0_print(rank, f"epoch {epoch}: QAT schedule config {eff.quant}")
        return _step_cache[key]

    mll.end("init")
    mll.start("run")
    prof_ctx = None
    if args.enable_profiling:
        # jax.profiler trace (the autograd-profiler/chrome-trace analogue,
        # dlrm_s_pytorch.py:1501-1503, :1783-1795)
        from deep_quantized_recommendation_model_dqrm_tpu.utils.profiling import trace

        prof_ctx = trace(args.profile_dir)
        prof_ctx.__enter__()
        rank0_print(rank, f"profiling to {args.profile_dir}")
    it = 0
    it_last_print = 0
    next_print = tc.print_freq
    next_test = tc.test_freq if tc.test_freq > 0 else 1 << 62
    # --val-freq: validation evals drive best-checkpoint selection (test
    # stays untouched for final metrics / mlperf thresholds)
    use_val_select = args.val_freq > 0 and val_loader is not None
    next_val = args.val_freq if use_val_select else 1 << 62
    _buf = []  # pending batches for the K-step megastep
    t_print = time.perf_counter()
    result = {}
    def globalize_batch(batch):
        """Multi-process launches: every process builds identical loaders
        (like the reference, dlrm_s_pytorch_comm_grad.py:1457), takes its
        host slice of the batch-sharded fields, and the slices are sewn
        into globally-sharded arrays (make_array_from_process_local_data).
        Single-process: identity."""
        if jax.process_count() == 1 or step_mode not in (
            "dp", "dp-nosync", "hybrid", "rowshard"
        ):
            return batch
        from jax.sharding import PartitionSpec as P

        from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import (
            Batch as _B,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.multihost import (
            local_batch_slice,
            make_global_batch,
        )

        B = int(np.asarray(batch.labels).shape[0])
        start, per = local_batch_slice(B)
        # dp shards indices on batch; hybrid/rowshard replicate them (each
        # device looks up its local tables over the FULL batch)
        shard_idx = step_mode in ("dp", "dp-nosync")

        def _idx(x):
            x = np.asarray(x)
            return x[:, start : start + per] if shard_idx else x

        local = _B(
            dense=np.asarray(batch.dense)[start : start + per],
            indices=_idx(batch.indices),
            labels=np.asarray(batch.labels)[start : start + per],
            mask=None if batch.mask is None else _idx(batch.mask),
        )
        idx_spec = P(None, "mp") if shard_idx else P()
        specs = _B(
            dense=P("mp"),
            indices=idx_spec,
            labels=P("mp"),
            mask=None if batch.mask is None else idx_spec,
        )
        return make_global_batch(local, mesh, specs)

    # eval steps are built ONCE (a fresh jax.jit wrapper per --test-freq
    # interval would pay full compile every eval)
    hybrid_eval_fn = None
    dp_eval_fn = None
    if step_mode == "hybrid":
        from deep_quantized_recommendation_model_dqrm_tpu.parallel.hybrid import (
            make_hybrid_eval_step,
        )

        _ev = make_hybrid_eval_step(cfg, mesh, plan, has_mask=has_mask,
                                    pin_mega_layout=args.pin_table_layout)
        hybrid_eval_fn = pad_eval(
            lambda s, b, _f=_ev: _f(s, globalize_batch(b)),
            len(mesh.devices.reshape(-1)),
        )
    elif step_mode == "rowshard":
        _ev = rowshard.make_rowshard_eval_step(cfg, mesh, plan, has_mask=has_mask)
        hybrid_eval_fn = pad_eval(
            lambda s, b, _f=_ev: _f(s, globalize_batch(b)),
            len(mesh.devices.reshape(-1)),
        )
    elif step_mode in ("dp", "dp-nosync"):
        _ev = comm_grad.make_dp_eval_step(
            cfg, mesh, has_mask=has_mask, pin_state_template=dp_pin
        )
        dp_eval_fn = pad_eval(
            lambda s, b, _f=_ev: _f(s, globalize_batch(b)),
            len(mesh.devices.reshape(-1)),
        )
    from deep_quantized_recommendation_model_dqrm_tpu.data.prefetch import prefetch

    if args.inference_only and step_mode in ("hybrid", "rowshard"):
        # deferred mega-table inference (the loaded/initial hstate is now
        # built): sharded eval over the distributed tables; PTQ packs from
        # the UNPACKED state (single-process only — the mega's remote
        # shards are not rank-0-addressable)
        if args.quantize_emb_with_bit in (4, 8):
            if jax.process_count() > 1:
                raise SystemExit(
                    "--inference-only PTQ is a single-process tool for the "
                    "mega-table engines (remote shards not addressable); "
                    "run it on one process"
                )
            from deep_quantized_recommendation_model_dqrm_tpu.serving import (
                make_serving_fn,
                ptq_export_streaming,
                serving_model_bytes,
            )

            trick = hstate.mlp.get("emb_trick", {})

            def get_table(k):
                # fresh device slice of table k out of the mega (packed
                # and FREED one at a time by ptq_export_streaming — the
                # whole-model unpack-then-pack holds sources + packing
                # temporaries + packed outputs at once and OOMs at
                # Terabyte scale)
                if step_mode == "hybrid":
                    if int(plan.table_rank[k]) < 0:
                        return trick[str(k)]
                    start = int(plan.table_rank[k]) * plan.block_rows + int(
                        plan.table_base[k]
                    )
                else:
                    if plan.dense_mask is not None and not bool(
                        plan.dense_mask[k]
                    ):
                        return trick[str(k)]
                    start = int(plan.table_base[k])
                return jax.lax.dynamic_slice(
                    hstate.mega,
                    (start, 0),
                    (cfg.table_sizes[k], hstate.mega.shape[1]),
                )

            vw_list = None
            if cfg.weighted_pooling is not None:
                vw_trick = hstate.mlp.get("vw_trick", {})
                unpacked_vw = (
                    hybrid.unpack_vw(hstate.vw, plan, cfg.table_sizes)
                    if step_mode == "hybrid"
                    else rowshard.unpack_rows_vw(
                        hstate.vw, plan, cfg.table_sizes
                    )
                )
                vw_list = [
                    vw_trick[str(k)] if v is None else v
                    for k, v in enumerate(unpacked_vw)
                ]
            sm = ptq_export_streaming(
                cfg,
                get_table,
                bot=hstate.mlp["bot"],
                top=hstate.mlp["top"],
                vw=vw_list,
                emb_bits=args.quantize_emb_with_bit,
                mlp_bits=args.quantize_mlp_with_bit
                if args.quantize_mlp_with_bit in (8,)
                else 32,
            )
            rank0_print(
                rank, f"PTQ model: {serving_model_bytes(sm)/1e6:.2f} MB"
            )
            if hasattr(hstate.mega, "delete"):
                hstate.mega.delete()
            sfn = make_serving_fn(sm)
            m = evaluate(cfg, hstate, test_loader, lambda s, b: sfn(b))
        else:
            m = evaluate(cfg, hstate, test_loader, hybrid_eval_fn)
        rank0_print(rank, f"inference: {m}")
        return m

    def document_tables(tag: str) -> None:
        """Dump every embedding table to <log-dir>/table_weights_<tag>.npz
        (the reference's documenting_weights_tables before/after training,
        dlrm_s_pytorch_comm_grad.py:1699, 2112 — txt dumps there; npz here)."""
        if not args.documenting_table_weight or rank != 0:
            return
        if jax.process_count() > 1 and step_mode in ("hybrid", "rowshard"):
            # the mega-table spans devices of OTHER processes — rank 0
            # cannot address those shards eagerly; dumping would raise on
            # rank 0 and deadlock the others' collectives
            rank0_print(
                rank,
                "--documenting-table-weight is a single-process tool; "
                "skipping (mega-table shards are not rank-0-addressable)",
            )
            return
        import os as _os

        import numpy as _np

        if step_mode in ("hybrid", "rowshard"):
            emb = (
                hybrid.unpack_tables(hstate.mega, plan, cfg.table_sizes)
                if step_mode == "hybrid"
                else rowshard.unpack_rows(hstate.mega, plan, cfg.table_sizes)
            )
            trick = hstate.mlp.get("emb_trick", {})
        else:
            emb = state.params["emb"]
            trick = {}
        arrs = {}
        for k, t in enumerate(emb):
            entry = trick[str(k)] if t is None else t
            if isinstance(entry, dict):
                for name, leaf in entry.items():
                    arrs[f"table_{k}_{name}"] = _np.asarray(leaf)
            else:
                arrs[f"table_{k}"] = _np.asarray(entry)
        out = _os.path.join(args.log_dir or ".", f"table_weights_{tag}.npz")
        _np.savez(out, **arrs)
        rank0_print(rank, f"documented table weights -> {out}")

    document_tables("0")

    # --documenting-table-grads: per-batch sparse embedding-grad dumps at a
    # cadence (the gradient half of the reference documenting driver,
    # dlrm_s_pytorch_single_gpu_documentingp.py:969-987). Probes the CURRENT
    # batch against the PRE-update params with a dedicated jitted extractor
    # so the hot training path is untouched.
    dtg = args.documenting_table_grads
    if dtg > 0:
        if step_mode not in ("none", "dp", "dp-nosync"):
            raise SystemExit(
                "--documenting-table-grads supports parallelism none/dp "
                "(the mega-table engines' shards are not rank-0-addressable)"
            )
        if jax.process_count() > 1:
            raise SystemExit(
                "--documenting-table-grads is a single-process tool"
            )
    _probe_cache: dict = {}

    def document_grads(epoch: int, it_: int, batch) -> None:
        if rank != 0:
            return
        from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
            config_for_epoch,
            make_grad_probe,
        )

        eff = config_for_epoch(cfg, tc, epoch)
        if eff not in _probe_cache:
            _probe_cache[eff] = make_grad_probe(eff, tc)
        if step_mode in ("dp", "dp-nosync"):
            # dp params are mesh-replicated; pull them host-side so the
            # single-device probe jit takes uncommitted arrays (diagnostic
            # cadence — the copy is acceptable)
            params = jax.tree_util.tree_map(np.asarray, dstate.params)
            qs = jax.tree_util.tree_map(np.asarray, dstate.qstate)
        else:
            params, qs = state.params, state.qstate
        out, ploss = _probe_cache[eff](params, qs, batch)
        arrs = {k2: np.asarray(v) for k2, v in out.items()}
        path = os.path.join(args.log_dir or ".", f"table_grads_it{it_}.npz")
        np.savez(path, **arrs)
        rank0_print(
            rank,
            f"documented table grads at it {it_} "
            f"(probe loss {float(ploss):.6f}) -> {path}",
        )

    _abuf = []  # pending batches for --mlperf-grad-accum-iter
    _dtg_last = -1  # last iteration a grad dump fired at
    for epoch in range(start_epoch, tc.nepochs):
        mll.start("epoch", {"num": epoch})
        step_fn = get_step(epoch)
        # background prefetch overlaps host batch prep with device compute
        for bi, batch in enumerate(prefetch(train_loader, depth=3)):
            if epoch == start_epoch and bi < start_batch:
                continue  # fast-forward resume (dlrm_s_pytorch.py:1523-1534)
            if step_mode in ("dp", "dp-nosync", "hybrid", "rowshard"):
                ndev = len(mesh.devices.reshape(-1))
                if batch.labels.shape[0] % ndev != 0:
                    # mirror the reference's skip-with-warning for batches
                    # not divisible by world size (dlrm_s_pytorch.py:1553-1558)
                    rank0_print(
                        rank,
                        f"Warning: skipping batch {bi} (size "
                        f"{batch.labels.shape[0]} % {ndev} != 0)",
                    )
                    continue
            if dtg > 0 and it % dtg == 0 and _dtg_last != it:
                # (megastep buffering keeps `it` constant for k batches;
                # dump only the first batch at each cadence point)
                document_grads(epoch, it, batch)
                _dtg_last = it
            batch = globalize_batch(batch)
            if accum_n > 1:
                # gradient accumulation: one optimizer step per accum_n
                # batches (--grad-accum-semantics)
                _abuf.append(batch)
                if len(_abuf) < accum_n:
                    continue
                if args.grad_accum_semantics == "reference":
                    # the reference's zero_grad placement discards the
                    # first k-1 micro-grads (dlrm_s_pytorch.py:1596-1600):
                    # the applied update is the k-th batch's gradient alone
                    batch, _abuf = _abuf[-1], []
                else:
                    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                        concat_batches,
                    )

                    batch, _abuf = concat_batches(_abuf), []
            it_prev = it
            if multi_k > 1:
                # K-batch megastep: buffer then dispatch once
                _buf.append(batch)
                if len(_buf) < multi_k:
                    continue
                pack, _buf = _buf, []
                if step_mode == "dp":
                    dstate, loss = step_fn(dstate, pack)
                elif step_mode in ("hybrid", "rowshard"):
                    hstate, loss = step_fn(hstate, pack)
                else:
                    # stacked upload: one device transfer per field instead
                    # of one per batch (tunnel round trips dominate)
                    from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                        stack_batches,
                    )

                    state, loss = step_fn(state, stack_batches(pack))
                it += multi_k
            elif step_mode in ("dp", "dp-nosync"):
                dstate, loss = step_fn(dstate, batch)
                it += 1
            elif step_mode in ("hybrid", "rowshard"):
                hstate, loss = step_fn(hstate, batch)
                it += 1
            elif step_mode == "pseudo":
                pstate, loss = step_fn(pstate, batch)
                state = state._replace(params=pstate.params, qstate=pstate.qstate)
                it += 1
            else:
                state, loss = step_fn(state, batch)
                it += 1
            if step_mode in ("dp", "dp-nosync"):
                # dp-nosync = the dp_only.py ablation: NO periodic sync;
                # dp syncs when the step count crosses a period boundary
                if (
                    step_mode == "dp"
                    and sync_fn is not None
                    and tc.weight_sync_period > 0
                    and it // tc.weight_sync_period > it_prev // tc.weight_sync_period
                ):
                    dstate = sync_fn(dstate)
                state = state._replace(params=dstate.params, qstate=dstate.qstate)
            # fetch the loss only at print boundaries — sync readback per
            # step costs ~40ms+ on tunneled TPUs (see .claude/skills/verify)
            if it >= next_print:
                loss_v = float(loss)
                n_since = it - it_last_print
                dt = (time.perf_counter() - t_print) / max(n_since, 1) * 1e3
                t_print = time.perf_counter()
                it_last_print = it
                while next_print <= it:
                    next_print += tc.print_freq
                wall = (
                    " ({})".format(time.strftime("%H:%M"))
                    if tc.print_wall_time
                    else ""
                )
                # dt is WALL time between prints divided by steps — it
                # includes compiles, evals, host batch generation, and
                # tunnel stalls. It is NOT a step time: the honest drained
                # chain-slope per-step numbers come from bench.py (see
                # .claude/skills/verify/SKILL.md methodology).
                rank0_print(
                    rank,
                    f"Finished training it {it}/{len(train_loader)} of epoch {epoch}, "
                    f"{dt:.2f} ms/it (wall incl. compile/eval), "
                    f"loss {loss_v:.6f}" + wall,
                )
                logger.add_scalar("Train/Loss", loss_v, it)
            def run_eval(loader):
                # one dispatch point for test AND val evals
                nonlocal dstate, state
                if step_mode in ("hybrid", "rowshard"):
                    # sharded eval: tables stay distributed (no single-chip
                    # unpack; Terabyte tables may not fit one device), eval
                    # step compiled exactly once (hoisted above the loop)
                    return evaluate(cfg, hstate, loader, hybrid_eval_fn)
                if step_mode in ("dp", "dp-nosync"):
                    # rank-sharded eval (inference_distributed,
                    # comm_grad.py:1170-1305); nosync replicas are
                    # re-averaged first (dp_only.py's accuracy aggregation)
                    if step_mode == "dp-nosync" and sync_fn is not None:
                        dstate = sync_fn(dstate)
                        state = state._replace(
                            params=dstate.params, qstate=dstate.qstate
                        )
                    return evaluate(cfg, dstate, loader, dp_eval_fn)
                return evaluate(cfg, state, loader, eval_fn)

            def save_best(m, acc_key, metric_label):
                nonlocal best_acc
                if not (ckpt and m.get("accuracy", 0.0) > best_acc):
                    return
                best_acc = m["accuracy"]
                # hybrid saves the SHARDED state via Orbax (each device
                # writes its mega-table shard; no single-device unpack).
                # dp modes save the replicated TrainState (npz), which
                # the standard --load-model path restores.
                save_state = (
                    hstate if step_mode in ("hybrid", "rowshard") else state
                )
                ckpt.save(
                    save_state,
                    {"epoch": epoch, "batch": bi + 1, "iter": it,
                     # "test_acc" key kept for resume-compat; records the
                     # SELECTION metric (val acc when --val-freq is on)
                     "test_acc": best_acc,
                     "test_auc": m.get("roc_auc", 0.0),
                     "selected_on": acc_key, **arch_meta},
                )
                rank0_print(
                    rank,
                    f"Saved best checkpoint ({metric_label} {best_acc:.4f})",
                )

            if use_val_select and it >= next_val:
                while next_val <= it:
                    next_val += args.val_freq
                vm = run_eval(val_loader)
                rank0_print(rank, f"Validation at - {it}/{epoch}: {vm}")
                logger.add_scalar("Val/Acc", vm.get("accuracy", 0.0), it)
                logger.add_scalar("Val/AUC", vm.get("roc_auc", 0.0), it)
                save_best(vm, "val", "val acc")
            if tc.test_freq > 0 and it >= next_test:
                while next_test <= it:
                    next_test += tc.test_freq
                m = run_eval(test_loader)
                rank0_print(rank, f"Testing at - {it}/{epoch}: {m}")
                logger.add_scalar("Test/Acc", m.get("accuracy", 0.0), it)
                logger.add_scalar("Test/AUC", m.get("roc_auc", 0.0), it)
                result = m
                if not use_val_select:
                    save_best(m, "test", "acc")
                if (
                    args.mlperf_acc_threshold > 0
                    and m.get("accuracy", 0.0) >= args.mlperf_acc_threshold
                ) or (
                    args.mlperf_auc_threshold > 0
                    and m.get("roc_auc", 0.0) >= args.mlperf_auc_threshold
                ):
                    rank0_print(rank, "MLPerf threshold reached; stopping")
                    mll.event("threshold_reached", m)
                    mll.end("run")
                    if prof_ctx is not None:
                        prof_ctx.__exit__(None, None, None)
                    return m
        if _buf:
            # flush a partial megastep buffer with the single-step fn
            single = get_step(epoch, k=1)
            for b in _buf:
                if step_mode == "dp":
                    dstate, loss = single(dstate, b)
                    state = state._replace(params=dstate.params, qstate=dstate.qstate)
                elif step_mode in ("hybrid", "rowshard"):
                    hstate, loss = single(hstate, b)
                else:
                    state, loss = single(state, b)
                it += 1
            _buf = []
        if _abuf:
            if args.grad_accum_semantics == "reference":
                # the reference never fires a step for a partial window (its
                # buffer carries across epochs; our epoch boundary drops the
                # j<k discarded-anyway micro-grads, which is trajectory-
                # identical because only the k-th batch's grad ever applies)
                _abuf = []
            else:
                # flush a partial accumulation buffer (fewer than accum_n
                # batches left in the epoch) as one smaller concat step —
                # dropping it would silently skip training data. 'sum'
                # scales by the ACTUAL buffered count (one-off compile).
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    concat_batches,
                    make_train_step,
                )

                eff_f = config_for_epoch(cfg, tc, epoch)
                scale = (
                    float(len(_abuf))
                    if args.grad_accum_semantics == "sum"
                    else 1.0
                )
                flush_step = make_train_step(
                    eff_f,
                    tc.replace(loss_scale=scale),
                    sparse_emb_grad=_sparse_ok(eff_f),
                )
                state, loss = flush_step(state, concat_batches(_abuf))
                it += 1
                _abuf = []
        mll.end("epoch", {"num": epoch})
    mll.end("run")
    if prof_ctx is not None:
        prof_ctx.__exit__(None, None, None)
    if step_mode in ("dp", "dp-nosync"):
        if step_mode == "dp-nosync" and sync_fn is not None:
            dstate = sync_fn(dstate)
        state = state._replace(params=dstate.params, qstate=dstate.qstate)
    if not result:
        if step_mode in ("hybrid", "rowshard"):
            # sharded final eval — the mega-table stays distributed
            result = evaluate(
                cfg, hstate, test_loader, hybrid_eval_fn, max_batches=8
            )
        else:
            result = evaluate(cfg, state, test_loader, eval_fn, max_batches=8)
        rank0_print(rank, f"final eval: {result}")
        if ckpt:
            ckpt.save(
                hstate if step_mode in ("hybrid", "rowshard") else state,
                {"epoch": tc.nepochs, "batch": 0, "iter": it,
                 "test_acc": result.get("accuracy", 0.0), **arch_meta},
            )
    if args.plot_compute_graph and rank == 0:
        # torchviz compute-graph analogue (dlrm_s_pytorch.py:1797-1803):
        # dump the last train step's lowered StableHLO (lowering only
        # re-traces with abstract shapes; nothing executes).
        try:
            gstate = {
                "dp": lambda: dstate, "dp-nosync": lambda: dstate,
                "hybrid": lambda: hstate, "rowshard": lambda: hstate,
                "pseudo": lambda: pstate,
            }.get(step_mode, lambda: state)()
            if multi_k > 1:
                from deep_quantized_recommendation_model_dqrm_tpu.train_step import (
                    stack_batches,
                )

                # all megastep engines (incl. the sharded scan forms) take
                # the stacked leading-[k] Batch for AOT lowering
                arg = stack_batches([batch] * multi_k)
            else:
                arg = batch
            out = os.path.join(
                args.log_dir or ".", "compute_graph.stablehlo.txt"
            )
            with open(out, "w") as f:
                f.write(step_fn.lower(gstate, arg).as_text())
            rank0_print(rank, f"compute graph -> {out}")
        except Exception as e:  # pragma: no cover - best-effort tool
            rank0_print(rank, f"plot-compute-graph failed: {e}")
    document_tables("1")
    logger.close()
    return result


if __name__ == "__main__":
    run()
