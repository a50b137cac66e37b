#!/bin/bash
# Validate the multi-chip sharding on ONE machine with 8 virtual CPU
# devices — the reference's pseudo-multigpu trick, TPU-style.
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --platform=cpu --data-generation=random --num-batches=100 \
  --arch-embedding-size=10000-5000-1000 --arch-mlp-bot=13-64-16 \
  --arch-mlp-top=64-16-1 \
  --quantization_flag --parallelism=dp --grad-quant-bits=8 \
  --mini-batch-size=128 --print-freq=20 "$@"
