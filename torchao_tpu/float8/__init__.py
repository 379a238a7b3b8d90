from torchao_tpu.float8.config import (  # noqa: F401
    CastConfig,
    FP8Granularity,
    Float8GemmConfig,
    Float8LinearConfig,
    ScalingGranularity,
    ScalingType,
    _auto_filter_for_recipe,
)
from torchao_tpu.float8.float8_linear import (  # noqa: F401
    Float8TrainingWeight,
    convert_to_float8_training,
    float8_linear,
    float8_linear_with_wscale,
    precompute_float8_dynamic_scale_for_fsdp,
)
