from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import (  # noqa: F401
    Batch,
    QuantState,
    bce_loss,
    forward,
    freeze_ranges,
    init_params,
    init_quant_state,
    predict,
    unfreeze_ranges,
    update_emb_scales,
)
