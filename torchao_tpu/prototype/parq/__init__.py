from torchao_tpu.prototype.parq.api import (  # noqa: F401
    ParQConfig,
    lambda_schedule,
    parq_prox_step,
    parq_regularizer,
)
from torchao_tpu.prototype.parq.quantizers import (  # noqa: F401
    binary_sign,
    lsbq_quantize,
    ternary_quantize,
    unif_quantize,
)
from torchao_tpu.prototype.parq.optim import (  # noqa: F401
    QuantOptimizerState,
    prox_binary_relax,
    quant_optimizer,
)
