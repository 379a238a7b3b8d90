from torchao_tpu.models.llama.model import (  # noqa: F401
    ModelArgs,
    Transformer,
)
