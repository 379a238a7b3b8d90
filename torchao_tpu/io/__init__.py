from torchao_tpu.io.native_loader import (  # noqa: F401
    load_raw_checkpoint,
    native_loader_available,
    save_raw_checkpoint,
)
