from torchao_tpu.prototype.spinquant.spinquant import (  # noqa: F401
    apply_spinquant,
)
from torchao_tpu.prototype.spinquant.hadamard_utils import (  # noqa: F401
    hadamard_matrix,
    random_hadamard_matrix,
)
