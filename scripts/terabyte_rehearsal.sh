#!/bin/bash
# Terabyte-scale on-chip dress rehearsal — the second flagship's integration
# proof (the analogue of the reference's Terabyte driver family:
# dlrm_s_pytorch_tb_dp_one_parallel_comm.py:1406-1991 train(args) +
# bash_scripts/Terabytes/run_dist.sh + paper Table 3b):
#
#   Terabyte arch (real 26-table cardinalities incl. five ~10M-row tables,
#   d=64, 6.3 GB bf16) on the learnable-synthetic stream -> 4-epoch QAT
#   schedule (FP32 pretrain -> emb INT4 -> MLP INT4 flip -> bit shift) with
#   scale_update_period=1000 under --parallelism=dp with INT8
#   compressed+sparsified gradient exchange, periodic weight sync, PINNED
#   row-major bf16 tables (unpinned layouts OOM / 66 ms/it — see
#   train_step.pin_params_layout), k-step scan megasteps -> periodic evals
#   -> best-checkpoint save -> PTQ INT4/INT8 packed inference from that
#   checkpoint (paper Table 3b: packed INT4 model 1.572 GB = 8x fp32).
#
# Results are recorded in PARITY.md §"Terabyte dress rehearsal".
# Runtime: ~30-45 min on v5e-1 (model init/upload + compiles dominate).
set -e
OUT=${OUT:-/tmp/dqrm_tb_rehearsal}
STEPS=${STEPS:-600}        # batches per epoch (B=2048 -> 1.2M samples/epoch)
mkdir -p "$OUT"

ARCH_EMB="9980333-36084-17217-7378-20134-3-7112-1442-61-9758201-1333352-313829-10-2208-11156-122-4-970-14-9994222-7267859-9946608-415421-12420-101-36"

python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=learnable --num-batches="$STEPS" \
  --arch-embedding-size="$ARCH_EMB" --arch-sparse-feature-size=64 \
  --arch-mlp-bot=13-512-256-64 --arch-mlp-top=512-512-256-1 \
  --max-ind-range=10000000 \
  --table-dtype=bfloat16 --pin-table-layout \
  --quantization_flag --embedding_bit=4 --weight_bit=4 \
  --scale-update-period=1000 \
  --pretrain_and_quantize --pretrain_and_quantize_lin \
  --linear_shift_down_bit_width --shift-bit-width-to=4 \
  --parallelism=dp --grad-quant-bits=8 --weight-sync-period=200 \
  --steps-per-dispatch=8 \
  --mini-batch-size=2048 --test-mini-batch-size=8192 \
  --learning-rate=0.1 --nepochs=4 \
  --print-freq=200 --test-freq=300 \
  --save-model="$OUT/ckpt" --log-dir="$OUT" \
  2>&1 | tee "$OUT/train.log"

echo "=== PTQ inference from the best checkpoint ==="
python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=learnable --num-batches="$STEPS" \
  --arch-embedding-size="$ARCH_EMB" --arch-sparse-feature-size=64 \
  --arch-mlp-bot=13-512-256-64 --arch-mlp-top=512-512-256-1 \
  --max-ind-range=10000000 --table-dtype=bfloat16 \
  --mini-batch-size=2048 --test-mini-batch-size=8192 \
  --inference-only --load-model="$OUT/ckpt" \
  --quantize-emb-with-bit=4 --quantize-mlp-with-bit=8 \
  2>&1 | tee "$OUT/ptq.log"

echo "logs: $OUT/train.log $OUT/ptq.log"
