from torchao_tpu.prototype.codebook.api import (  # noqa: F401
    CodebookQuantizedArray,
    CodebookWeightOnlyConfig,
)
