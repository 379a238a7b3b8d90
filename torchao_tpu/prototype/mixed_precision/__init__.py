from torchao_tpu.prototype.mixed_precision.search import (  # noqa: F401
    mixed_precision_search,
    sensitivity_analysis,
)
