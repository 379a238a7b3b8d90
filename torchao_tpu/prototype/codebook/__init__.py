from torchao_tpu.prototype.codebook.api import (  # noqa: F401
    BlockCodebookQuantizedArray,
    BlockCodebookWeightOnlyConfig,
    CodebookQuantizedArray,
    CodebookWeightOnlyConfig,
    GroupwiseLutQuantizedArray,
    GroupwiseLutWeightConfig,
)
