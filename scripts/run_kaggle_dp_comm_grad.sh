#!/bin/bash
# DQRM distributed QAT with INT8 compressed+sparsified gradient exchange
# over all visible devices (the dlrm_s_pytorch_comm_grad.py recipe).
DATA=${DATA:-./criteo_kaggle_processed}
python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=dataset --processed-data-dir="$DATA" \
  --arch-sparse-feature-size=16 --arch-mlp-bot=13-512-256-64-16 \
  --arch-mlp-top=512-256-1 \
  --quantization_flag --embedding_bit=4 --weight_bit=4 \
  --scale-update-period=200 \
  --parallelism=dp --grad-quant-bits=8 --weight-sync-period=200 \
  --mini-batch-size=512 --learning-rate=0.1 --nepochs=5 \
  --print-freq=1024 --test-freq=30000 "$@"
