from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import (  # noqa: F401
    Batch,
    QuantState,
    bce_loss,
    forward,
    init_params,
    init_quant_state,
    predict,
    update_emb_scales,
)
