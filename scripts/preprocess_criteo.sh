#!/bin/bash
# Raw Criteo train.txt -> per-day npz + binary (data_utils.getCriteoAdData
# analogue; C++ parser auto-builds from native/criteo_preprocess.cpp).
RAW=${1:?usage: preprocess_criteo.sh <train.txt> <out_dir>}
OUT=${2:?usage: preprocess_criteo.sh <train.txt> <out_dir>}
python - "$RAW" "$OUT" <<'PY'
import sys
from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import preprocess_criteo
from deep_quantized_recommendation_model_dqrm_tpu.data.binary import numpy_to_binary
paths = preprocess_criteo(sys.argv[1], sys.argv[2], num_days=7)
n = numpy_to_binary(paths, sys.argv[2] + "/train.bin")
print(f"wrote {len(paths)} day files + {n} binary records")
PY
