from deep_quantized_recommendation_model_dqrm_tpu.optim.lr_policy import (  # noqa: F401
    lr_policy,
)
from deep_quantized_recommendation_model_dqrm_tpu.optim.sgd import (  # noqa: F401
    adagrad_init,
    adagrad_update,
    rwsadagrad_init,
    rwsadagrad_update,
    sgd_update,
)
