from torchao_tpu.optim.adam import (  # noqa: F401
    Adam4bit,
    Adam8bit,
    AdamFp8,
    AdamW4bit,
    AdamW8bit,
    AdamWFp8,
    quantized_adam,
)
