from deep_quantized_recommendation_model_dqrm_tpu.utils.metrics import (  # noqa: F401
    accuracy,
    binary_metrics,
    roc_auc,
)
