from torchao_tpu.sparsity.sparse_api import (  # noqa: F401
    BlockSparseWeightConfig,
    SemiSparseWeightConfig,
    apply_fake_sparsity,
    sparsify_,
)
from torchao_tpu.sparsity.wanda import WandaSparsifier  # noqa: F401
from torchao_tpu.sparsity.supermask import SupermaskWeight, to_supermask  # noqa: F401
