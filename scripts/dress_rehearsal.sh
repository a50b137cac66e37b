#!/bin/bash
# Full-scale on-chip dress rehearsal — the integration proof chaining every
# headline piece in ONE recorded run (the analogue of the reference's
# captured bash_scripts/Kaggle/dlrm_quantized200.txt logs):
#
#   Kaggle arch (real 26-table cardinalities, 2.16 GB fp32) on the
#   learnable-synthetic stream -> 4-epoch QAT schedule (FP32 pretrain ->
#   emb INT4 -> MLP INT4 flip -> bit shift) under --parallelism=dp with
#   INT8 compressed+sparsified gradient exchange and periodic weight sync
#   -> periodic evals -> best-checkpoint save -> PTQ INT4/INT8 packed
#   inference from that checkpoint.
#
# Results are recorded in PARITY.md §"Dress rehearsal" as the regression
# baseline. Runtime: ~10 min on v5e-1 (host batch generation dominates).
set -e
OUT=${OUT:-/tmp/dqrm_rehearsal}
STEPS=${STEPS:-2500}        # batches per epoch
mkdir -p "$OUT"

ARCH_EMB="1460-583-10131227-2202608-305-24-12517-633-3-93145-5683-8351593-3194-27-14992-5461306-10-5652-2173-4-7046547-18-15-286181-105-142572"

python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=learnable --num-batches="$STEPS" \
  --arch-embedding-size="$ARCH_EMB" --arch-sparse-feature-size=16 \
  --arch-mlp-bot=13-512-256-64-16 --arch-mlp-top=512-256-1 \
  --quantization_flag --embedding_bit=4 --weight_bit=4 \
  --scale-update-period=200 \
  --pretrain_and_quantize --pretrain_and_quantize_lin \
  --linear_shift_down_bit_width --shift-bit-width-to=4 \
  --parallelism=dp --grad-quant-bits=8 --weight-sync-period=200 \
  --mini-batch-size=128 --test-mini-batch-size=4096 \
  --learning-rate=0.1 --nepochs=4 \
  --print-freq=500 --test-freq=1000 \
  --save-model="$OUT/ckpt.npz" --log-dir="$OUT" \
  2>&1 | tee "$OUT/train.log"

echo "=== PTQ inference from the best checkpoint ==="
python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=learnable --num-batches="$STEPS" \
  --arch-embedding-size="$ARCH_EMB" --arch-sparse-feature-size=16 \
  --arch-mlp-bot=13-512-256-64-16 --arch-mlp-top=512-256-1 \
  --mini-batch-size=128 --test-mini-batch-size=4096 \
  --inference-only --load-model="$OUT/ckpt.npz" \
  --quantize-emb-with-bit=4 --quantize-mlp-with-bit=8 \
  2>&1 | tee "$OUT/ptq.log"

echo "logs: $OUT/train.log $OUT/ptq.log"
