#!/bin/bash
# Terabyte rehearsal on the MEGA-TABLE HYBRID engine (round 5) — the same
# 4-epoch QAT chain as scripts/terabyte_rehearsal.sh (recorded round 4
# under dp INT8: AUC 0.591->0.683) but on the engine the round-5
# measurement found 2x faster at Terabyte scale (4.7 vs 9.96 ms/it:
# ONE fused mega gather + scatter vs 26 per-table latency-bound ops).
# Single chip, pinned row-major mega built by host-chunk streaming
# (hybrid.pack_tables_pinned_streaming), Orbax sharded checkpoints.
# Results recorded in PARITY.md §"Terabyte dress rehearsal".
set -e
OUT=${OUT:-/tmp/dqrm_tb_rehearsal_hybrid}
STEPS=${STEPS:-600}
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
  --parallelism=hybrid \
  --steps-per-dispatch=8 \
  --mini-batch-size=2048 --test-mini-batch-size=8192 \
  --learning-rate=0.1 --nepochs=4 \
  --print-freq=200 --test-freq=300 \
  --save-model="$OUT/ckpt" --log-dir="$OUT" \
  2>&1 | tee "$OUT/train.log"

echo "logs: $OUT/train.log"
