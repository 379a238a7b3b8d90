from torchao_tpu.prototype.autoround.api import (  # noqa: F401
    AutoRoundConfig,
    autoround_quantize_weight,
)
