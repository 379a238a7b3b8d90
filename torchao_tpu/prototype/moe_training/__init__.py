from torchao_tpu.prototype.moe_training.scaled_grouped_mm import (  # noqa: F401
    fp8_scaled_grouped_mm,
)
