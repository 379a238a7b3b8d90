from torchao_tpu.ops.qlinear import (  # noqa: F401
    linear,
    register_qlinear_dispatch,
)
from torchao_tpu.ops.embedding import embedding  # noqa: F401
