from torchao_tpu.qtypes.base import (  # noqa: F401
    KernelPreference,
    PackingFormat,
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.qtypes.composition import (  # noqa: F401
    LinearActivationQuantizedArray,
    WeightTensorWithLinearActivationScaleMetadata,
    register_act_quant,
)
from torchao_tpu.qtypes.float8 import (  # noqa: F401
    Float8ActQuantSpec,
    Float8Array,
)
from torchao_tpu.qtypes.intx import IntxArray  # noqa: F401
from torchao_tpu.qtypes.packing import (  # noqa: F401
    pack_int4,
    pack_uintx,
    unpack_int4,
    unpack_uintx,
)
from torchao_tpu.qtypes.nf4 import NF4Array, linear_nf4, to_nf4  # noqa: F401
from torchao_tpu.qtypes.floatx import FloatxArray  # noqa: F401


# Reference-named constructor aliases (``torchao.dtypes.__init__``:
# ``to_affine_quantized_intx`` etc. are the functional constructors of
# AffineQuantizedTensor; here they build the corresponding qarrays).
to_affine_quantized_intx = IntxArray.from_hp
to_affine_quantized_fpx = FloatxArray.from_hp
to_affine_quantized_floatx = FloatxArray.from_hp
to_linear_activation_quantized = LinearActivationQuantizedArray
to_weight_tensor_with_linear_activation_scale_metadata = (
    WeightTensorWithLinearActivationScaleMetadata
)
