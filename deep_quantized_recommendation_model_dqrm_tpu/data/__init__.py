from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: F401
    RandomBatchLoader,
    random_batch,
    random_batches_on_device,
)
