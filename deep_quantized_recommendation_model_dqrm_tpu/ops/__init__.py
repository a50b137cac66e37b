from deep_quantized_recommendation_model_dqrm_tpu.ops.quant import (  # noqa: F401
    asymmetric_quantization_params,
    dequantize,
    fake_quant,
    fake_quant_pact,
    fake_quant_lsq,
    quantize,
    quantize_ste,
    ste_round,
    symmetric_quantization_params,
    table_scale,
)
