"""torchao_tpu — a TPU-native quantized-inference framework built from scratch.

Re-designs the capabilities of torchao (reference: yiliu30/torchao-fork,
v0.13.0) for TPU hardware: quantized array types expressed as JAX pytrees,
pure-jnp quantization primitives with exact torchao qparam math, a
``quantize_``-style config/transform API, and Pallas kernels (fused
int4/int8 dequant-matmul, fp8 rowwise matmul, quantized-KV attention)
replacing the CUDA/CUTLASS/Triton kernel zoo.

Layer map (mirrors SURVEY.md §1 "TPU mapping"):
  L0  torchao_tpu.kernels      — Pallas kernels + XLA-native ops
  L1  torchao_tpu.quantization.quant_primitives — pure-jnp primitives
  L2  torchao_tpu.qtypes       — quantized array pytrees + packing layouts
  L3  torchao_tpu.ops          — qlinear dispatch (explicit, registry-keyed)
  L4  torchao_tpu.quantization.quant_api — configs + quantize_ transform
  L5  torchao_tpu.models       — Llama decoder + generate/eval harness
  D   torchao_tpu.parallel     — mesh/sharding rules for quantized pytrees
"""

__version__ = "0.1.0"

from torchao_tpu.quantization.granularity import (  # noqa: F401
    Granularity,
    PerAxis,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    PerToken,
)
from torchao_tpu.quantization.quant_api import (  # noqa: F401
    Float8DynamicActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    ModuleFqnToConfig,
    quantize_,
)

from torchao_tpu.quantization.autoquant import autoquant, autoquant_  # noqa: F401,E402
from torchao_tpu import ops  # noqa: F401,E402
