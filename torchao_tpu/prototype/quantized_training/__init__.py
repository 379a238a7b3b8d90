from torchao_tpu.prototype.quantized_training.api import (  # noqa: F401
    BitNetTrainingConfig,
    Int8WeightOnlyQuantizedTrainingConfig,
)
