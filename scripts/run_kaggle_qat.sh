#!/bin/bash
# Criteo Kaggle DQRM INT4 QAT — the README recipe of the reference
# (bash_scripts/Kaggle/*): single chip, periodic scale update 200.
# Expects preprocessed data under $DATA (see scripts/preprocess_criteo.sh).
DATA=${DATA:-./criteo_kaggle_processed}
python -m deep_quantized_recommendation_model_dqrm_tpu.train \
  --data-generation=dataset --processed-data-dir="$DATA" \
  --arch-sparse-feature-size=16 --arch-mlp-bot=13-512-256-64-16 \
  --arch-mlp-top=512-256-1 \
  --quantization_flag --embedding_bit=4 --weight_bit=4 \
  --scale-update-period=200 \
  --mini-batch-size=128 --learning-rate=0.1 --nepochs=5 \
  --steps-per-dispatch=16 \
  --print-freq=1024 --test-freq=30000 \
  --save-model=./ckpt_kaggle_int4 "$@"
