from torchao_tpu.optim.adam import (  # noqa: F401
    Adam4bit,
    Adam8bit,
    AdamFp8,
    AdamW4bit,
    AdamW8bit,
    AdamWFp8,
    quantized_adam,
)
from torchao_tpu.optim.offload import (  # noqa: F401
    OffloadState,
    fetch_from_host,
    host_memory_available,
    offload_optimizer,
    offload_to_host,
    repin_state,
)
