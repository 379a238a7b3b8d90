from torchao_tpu.prototype.parq.api import (  # noqa: F401
    ParQConfig,
    parq_prox_step,
    parq_regularizer,
)
