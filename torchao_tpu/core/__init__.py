from torchao_tpu.core.config import (  # noqa: F401
    AOBaseConfig,
    config_from_dict,
    config_to_dict,
)
