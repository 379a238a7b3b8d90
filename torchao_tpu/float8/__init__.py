from torchao_tpu.float8.config import (  # noqa: F401
    CastConfig,
    Float8LinearConfig,
    ScalingGranularity,
)
from torchao_tpu.float8.float8_linear import (  # noqa: F401
    Float8TrainingWeight,
    convert_to_float8_training,
    float8_linear,
)
