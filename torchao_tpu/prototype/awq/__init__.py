from torchao_tpu.prototype.awq.api import (  # noqa: F401
    AWQConfig,
    awq_search_scales,
    convert_awq_,
    insert_awq_observers_,
)
