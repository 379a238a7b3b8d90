from torchao_tpu.prototype.spinquant.spinquant import (  # noqa: F401
    apply_spinquant,
    r4_matrix,
)
from torchao_tpu.prototype.spinquant.hadamard_utils import (  # noqa: F401
    apply_hadamard,
    hadamard_matrix,
    is_hadamard_order,
    random_hadamard_matrix,
)
