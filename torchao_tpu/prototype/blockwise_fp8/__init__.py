from torchao_tpu.prototype.blockwise_fp8.api import (  # noqa: F401
    Float8BlockwiseLinearConfig,
)
from torchao_tpu.prototype.blockwise_fp8.training import (  # noqa: F401
    Float8BlockwiseTrainingConfig,
    Float8BlockwiseTrainingWeight,
    blockwise_fp8_linear,
    convert_to_blockwise_fp8_training,
)
