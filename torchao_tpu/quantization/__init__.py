"""Public quantization API.

Mirrors ``torchao.quantization.__init__``'s surface (reference
``torchao/quantization/__init__.py`` ``__all__``) so code written
against the reference finds the same names here: configs + lowercase
aliases, ``quantize_``, observers, autoquant, GPTQ, smoothquant, and
the shared helpers. GPU-specific entries (Marlin/gemlite/fbgemm
layouts, pt2e) are documented non-goals — see COVERAGE.md.
"""

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
    TorchAODType,
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
from torchao_tpu.quantization.quant_api import (  # noqa: F401
    AOPerModuleConfig,
    FPXWeightOnlyConfig,
    Float8DynamicActivationFloat8WeightConfig,
    Float8StaticActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    Int4DynamicActivationInt4WeightConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    IntxWeightOnlyConfig,
    ModuleFqnToConfig,
    UIntXWeightOnlyConfig,
    float8_dynamic_activation_float8_weight,
    float8_static_activation_float8_weight,
    float8_weight_only,
    fpx_weight_only,
    int4_dynamic_activation_int4_weight,
    int4_weight_only,
    int8_dynamic_activation_int4_weight,
    int8_dynamic_activation_int8_weight,
    int8_weight_only,
    quantize_,
    uintx_weight_only,
)
from torchao_tpu.quantization.transform_module import (  # noqa: F401
    register_quantize_module_handler,
)
from torchao_tpu.quantization.observer import (  # noqa: F401
    MinMaxObserverState,
    MovingAvgObserverState,
    MSEObserverState,
    ObserverConfig,
    minmax_calculate_qparams,
    minmax_update,
)
from torchao_tpu.quantization.autoquant import autoquant  # noqa: F401
from torchao_tpu.quantization.gptq import (  # noqa: F401
    gptq_quantize_int4,
    gptq_quantize_weight,
)
from torchao_tpu.quantization.smoothquant import (  # noqa: F401
    SmoothQuantConfig,
    convert_smoothquant_,
    insert_smoothquant_observers_,
)
from torchao_tpu.ops.int_mm import (  # noqa: F401
    int_scaled_matmul,
    safe_int_mm,
)
from torchao_tpu.utils import compute_error  # noqa: F401
