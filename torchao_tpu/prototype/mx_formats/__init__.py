from torchao_tpu.prototype.mx_formats.config import (  # noqa: F401
    MXFPInferenceConfig,
    MXLinearConfig,
    NVFP4InferenceConfig,
)
from torchao_tpu.prototype.mx_formats.mx_tensor import (  # noqa: F401
    MXArray,
    to_mx,
)
