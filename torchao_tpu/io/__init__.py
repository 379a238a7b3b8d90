from torchao_tpu.io.native_loader import (  # noqa: F401
    load_raw_checkpoint,
    native_loader_available,
    save_raw_checkpoint,
)
from torchao_tpu.io.tokenizer import (  # noqa: F401
    BpeTokenizer,
    train_byte_bpe,
)
