"""DeepSeek-V3-style blockwise fp8 linear.

Covers the reference's ``torchao/prototype/blockwise_fp8_inference``
(``blockwise_quantization.py``, ``blockwise_linear.py``): weight scales
per 128×128 block, activation scales per 1×128 block. Reuses
``Float8Array`` (whose block machinery is N-D) with the blockwise
granularities; the matmul runs through the generic fp8 dispatch
(dequant path — blockwise scale epilogues don't factor into rowwise
scales, so the fused kernel is a round-2 Pallas item).
"""

from __future__ import annotations

import dataclasses

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.float8 import Float8ActQuantSpec, Float8Array
from torchao_tpu.quantization.transform_module import (
    register_quantize_module_handler,
)


@dataclasses.dataclass
class Float8BlockwiseLinearConfig(AOBaseConfig):
    block_size: int = 128
    version: int = 1


@register_quantize_module_handler(Float8BlockwiseLinearConfig)
def _blockwise_fp8_transform(w, config: Float8BlockwiseLinearConfig):
    b = config.block_size
    if w.ndim < 2 or w.shape[-1] % b or w.shape[-2] % b:
        return w
    block = tuple([1] * (w.ndim - 2) + [b, b])
    spec = Float8ActQuantSpec(granularity="per_block_1x128")
    return Float8Array.from_hp(
        w, block_size=block, act_quant_spec=spec
    )
