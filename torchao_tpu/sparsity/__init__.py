from torchao_tpu.sparsity.sparse_api import (  # noqa: F401
    BlockSparseWeightConfig,
    SemiSparseWeightConfig,
    apply_fake_sparsity,
    sparsify_,
)
from torchao_tpu.sparsity.wanda import WandaSparsifier  # noqa: F401
from torchao_tpu.sparsity.supermask import SupermaskWeight, to_supermask  # noqa: F401
from torchao_tpu.sparsity.sparsifier import (  # noqa: F401
    CubicSL,
    LambdaSL,
    NearlyDiagonalSparsifier,
    WeightNormSparsifier,
    apply_masks,
    prepare,
    squash_mask,
)
from torchao_tpu.sparsity.pruner import (  # noqa: F401
    fpgm_scores,
    prune_channel_pair,
    prune_ffn,
    saliency_scores,
)
from torchao_tpu.sparsity.training import (  # noqa: F401
    SemiSparseTrainingWeight,
    semi_structured_sparsify,
    swap_linear_with_semi_sparse_linear,
    unwrap_semi_sparse,
)
from torchao_tpu.sparsity.blocksparse import (  # noqa: F401
    BlockSparseArray,
    bsr_linear,
)
