from torchao_tpu.quantization.granularity import (  # noqa: F401
    Granularity,
    PerAxis,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    PerToken,
)
from torchao_tpu.quantization.quant_primitives import (  # noqa: F401
    MappingType,
    ZeroPointDomain,
    choose_qparams_affine,
    choose_qparams_affine_tinygemm,
    choose_qparams_affine_with_min_max,
    choose_scale_float8,
    dequantize_affine,
    dequantize_affine_float8,
    dequantize_affine_tinygemm,
    fake_quantize_affine,
    quantize_affine,
    quantize_affine_float8,
    quantize_affine_tinygemm,
)
