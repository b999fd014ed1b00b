from chiron_tpu.models.model import (  # noqa: F401
    CNN_ZOO,
    apply_model,
    init_model,
    model_ratio,
    model_stride,
    output_len,
)
