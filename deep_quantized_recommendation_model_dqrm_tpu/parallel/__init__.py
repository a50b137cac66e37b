from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import (  # noqa: F401
    get_my_slice,
    get_split_lengths,
    make_mesh,
    table_assignment,
)
