from torchao_tpu.ops.qlinear import (  # noqa: F401
    linear,
    register_qlinear_dispatch,
)
