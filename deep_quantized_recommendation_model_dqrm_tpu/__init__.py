"""DQRM-TPU: a TPU-native Deep Quantized Recommendation Model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``YangZhou08/Deep_Quantized_Recommendation_Model_DQRM`` (DLRM + INT4
quantization-aware training + quantized/sparsified gradient communication),
built TPU-first:

- functional DLRM model over explicit parameter pytrees (no module clones),
- HAWQ-style symmetric fake-quant with STE via ``jax.custom_vjp``,
- periodic quantization-scale update as explicit, jit-carried state,
- bit-packed INT4 embedding tables with a Pallas fused gather+dequant+pool
  kernel for serving,
- hybrid parallelism (table-sharded embeddings + data-parallel MLPs) via
  ``shard_map`` over a device mesh with ``all_to_all`` on ICI,
- DQRM's compressed gradient exchange as INT8 quantize -> integer collective
  -> dequantize inside the jitted train step.

Reference behavior citations throughout point into the upstream repo
(``dlrm_s_pytorch.py``, ``quantization_supp/*``, ``sgd_quantized_gradients*``)
by file:line.
"""

__version__ = "0.1.0"

from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: F401
    DLRMConfig,
    QuantConfig,
    TrainConfig,
)
