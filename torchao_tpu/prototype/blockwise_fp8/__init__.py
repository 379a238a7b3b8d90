from torchao_tpu.prototype.blockwise_fp8.api import (  # noqa: F401
    Float8BlockwiseLinearConfig,
)
