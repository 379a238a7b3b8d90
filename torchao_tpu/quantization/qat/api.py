"""QAT API: prepare/convert transform.

Mirrors the reference's ``QATConfig`` two-step flow (``qat/api.py:40``):

- **prepare**: wrap each linear weight in a ``QATFakeQuantizedArray`` —
  the hp weight stays a trainable pytree leaf; the qlinear dispatch
  fake-quantizes activations and weights with STE gradients (the JAX
  counterpart of ``FakeQuantizedLinear``, ``qat/linear.py:42``).
- **convert**: unwrap and apply the real PTQ base config, so the deployed
  model uses true quantized kernels.

Because the wrapper is a pytree whose only array leaf is the hp weight,
``jax.grad`` over the params pytree trains it directly — no module
surgery, no optimizer special-casing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization.qat.fake_quantize_config import (
    FakeQuantizeConfigBase,
    IntxFakeQuantizeConfig,
    apply_fake_quant,
)
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)


@qarray_dataclass
class QATFakeQuantizedArray(QuantizedArray):
    weight: jnp.ndarray  # high-precision, TRAINABLE
    activation_config: Optional[FakeQuantizeConfigBase] = static_field(
        default=None
    )
    weight_config: Optional[FakeQuantizeConfigBase] = static_field(
        default=None
    )

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def fake_quantized_weight(self) -> jnp.ndarray:
        if self.weight_config is None:
            return self.weight
        return apply_fake_quant(self.weight, self.weight_config, True)

    def fake_quantize_activation(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.activation_config is None:
            return x
        return apply_fake_quant(x, self.activation_config, False)

    def dequantize(self, output_dtype=None):
        w = self.fake_quantized_weight()
        return w if output_dtype is None else w.astype(output_dtype)


@dataclasses.dataclass
class QATConfig(AOBaseConfig):
    """``QATConfig(base_config, step="prepare"|"convert")`` or explicit
    activation/weight fake-quant configs (reference ``qat/api.py:40-200``).
    """

    base_config: Optional[AOBaseConfig] = None
    activation_config: Optional[FakeQuantizeConfigBase] = None
    weight_config: Optional[FakeQuantizeConfigBase] = None
    step: str = "prepare"
    version: int = 1

    def __post_init__(self):
        assert self.step in ("prepare", "convert"), self.step


def _derive_fq_configs(base: AOBaseConfig):
    """Derive fake-quant configs matching a PTQ base config's numerics."""
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        Int8DynamicActivationInt4WeightConfig,
        Int8DynamicActivationInt8WeightConfig,
        Int8WeightOnlyConfig,
        IntxWeightOnlyConfig,
        PerGroup,
    )
    from torchao_tpu.quantization.quant_primitives import (
        MappingType,
        ZeroPointDomain,
    )

    if isinstance(base, IntxWeightOnlyConfig):
        # the embedding-table QAT base (reference qat/embedding.py
        # convert path targets IntxWeightOnlyConfig numerics)
        g = (
            base.granularity.group_size
            if isinstance(base.granularity, PerGroup) else None
        )
        return None, IntxFakeQuantizeConfig(
            dtype=base.weight_dtype,
            group_size=g,
            is_symmetric=base.mapping_type is MappingType.SYMMETRIC,
        )

    if isinstance(base, Int4WeightOnlyConfig):
        return None, IntxFakeQuantizeConfig(
            dtype="uint4", group_size=base.group_size, is_symmetric=False,
            zero_point_domain=ZeroPointDomain.FLOAT, eps=1e-6,
        )
    if isinstance(base, Int8WeightOnlyConfig):
        return None, IntxFakeQuantizeConfig(
            dtype="int8", group_size=base.group_size, is_symmetric=True,
        )
    if isinstance(base, Int8DynamicActivationInt4WeightConfig):
        return (
            IntxFakeQuantizeConfig(dtype="int8", is_symmetric=False),
            IntxFakeQuantizeConfig(
                dtype="int4", group_size=base.group_size, is_symmetric=True
            ),
        )
    if isinstance(base, Int8DynamicActivationInt8WeightConfig):
        return (
            IntxFakeQuantizeConfig(dtype="int8", is_symmetric=True),
            IntxFakeQuantizeConfig(dtype="int8", is_symmetric=True),
        )
    raise NotImplementedError(
        f"QAT derivation for {type(base).__name__} not supported"
    )


@register_quantize_module_handler(QATConfig)
def _qat_transform(w, config: QATConfig):
    if config.step == "prepare":
        act_cfg, w_cfg = config.activation_config, config.weight_config
        if w_cfg is None and config.base_config is not None:
            act_cfg, w_cfg = _derive_fq_configs(config.base_config)
        return QATFakeQuantizedArray(
            weight=w, activation_config=act_cfg, weight_config=w_cfg
        )
    # convert: unwrap + real PTQ
    if isinstance(w, QATFakeQuantizedArray):
        w = w.weight
    if config.base_config is None:
        return w
    return get_quantize_handler(config.base_config)(w, config.base_config)
