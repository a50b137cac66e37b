from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (  # noqa: F401
    PackedTable,
    pack_table,
    packed_pooled_lookup,
    packed_pooled_lookup_pallas,
    unpack_table,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.quant_matmul import (  # noqa: F401
    quantize_linear_weights,
    int8_linear,
)
