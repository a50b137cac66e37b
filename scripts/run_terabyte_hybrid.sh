#!/bin/bash
# Terabyte hybrid parallelism: table-sharded embeddings + all-to-all + DP
# MLPs (the hybrid_multi_gpu / hp_with_quantization recipe). Multi-host:
# set COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID (parallel/multihost.py).
DATA=${DATA:-./criteo_terabyte_processed}
# Raw day files? Set RAW_GLOB='day_*' to preprocess in parallel first
# (streams each file in bounded chunks; C++ dict build; N workers).
EXTRA=""
if [ -n "$RAW_GLOB" ]; then EXTRA="--raw-data-files=$RAW_GLOB --preprocess-workers=8"; fi
python -m deep_quantized_recommendation_model_dqrm_tpu.train $EXTRA \
  --data-generation=dataset --processed-data-dir="$DATA" \
  --arch-sparse-feature-size=64 --arch-mlp-bot=13-512-256-64 \
  --arch-mlp-top=512-512-256-1 --max-ind-range=10000000 \
  --quantization_flag --embedding_bit=4 --weight_bit=4 \
  --scale-update-period=1000 \
  --parallelism=hybrid --grad-quant-bits=8 \
  --mini-batch-size=2048 --learning-rate=0.1 --nepochs=1 \
  --print-freq=1024 --test-freq=100000 "$@"
