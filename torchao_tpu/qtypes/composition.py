"""Composition quantized arrays (L3 of SURVEY.md).

- ``LinearActivationQuantizedArray``: wraps a quantized weight plus a
  *named* activation-quantization function so the linear dispatch quantizes
  inputs dynamically — the reference's ``LinearActivationQuantizedTensor``
  (``torchao/quantization/linear_activation_quantized_tensor.py:21``),
  with the act-quant callable replaced by a registry key (callables are not
  hashable-stable across traces; names are).

- ``WeightTensorWithLinearActivationScaleMetadata``: smoothquant-style
  per-channel activation scale applied before dispatch (reference
  ``torchao/quantization/linear_activation_scale.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)

# registry: name -> fn(x) -> quantized activation (any QuantizedArray or
# (qdata, scale) pair consumed by the qlinear dispatch)
_ACT_QUANT_REGISTRY: Dict[str, Callable] = {}


def register_act_quant(name: str):
    def deco(fn):
        _ACT_QUANT_REGISTRY[name] = fn
        return fn

    return deco


def get_act_quant(name: str) -> Callable:
    return _ACT_QUANT_REGISTRY[name]


@qarray_dataclass
class LinearActivationQuantizedArray(QuantizedArray):
    original_weight: Any                     # a QuantizedArray pytree
    input_quant_name: str = static_field()
    quant_kwargs: Tuple[Tuple[str, Any], ...] = static_field(default=())

    @property
    def shape(self):
        return self.original_weight.shape

    @property
    def dtype(self):
        return self.original_weight.dtype

    def quantize_input(self, x: jnp.ndarray):
        fn = get_act_quant(self.input_quant_name)
        return fn(x, **dict(self.quant_kwargs))

    def dequantize(self, output_dtype=None):
        return self.original_weight.dequantize(output_dtype)

    def unstack_layer(self):
        import dataclasses

        return dataclasses.replace(
            self, original_weight=self.original_weight.unstack_layer()
        )


@qarray_dataclass
class WeightTensorWithLinearActivationScaleMetadata(QuantizedArray):
    """Weight wrapper that divides the activation by a per-channel
    ``equalization_scale`` before the inner quantized linear (smoothquant)."""

    original_weight: Any
    equalization_scale: jnp.ndarray

    @property
    def shape(self):
        return self.original_weight.shape

    @property
    def dtype(self):
        return self.original_weight.dtype

    def dequantize(self, output_dtype=None):
        return self.original_weight.dequantize(output_dtype)

    def unstack_layer(self):
        import dataclasses

        return dataclasses.replace(
            self, original_weight=self.original_weight.unstack_layer()
        )

    def take_layer(self, l):
        """Layer-slice the inner weight only: the equalization scale is
        per-INPUT-channel ([K], no layer axis) unless computed per layer
        ([L, K])."""
        import dataclasses

        eq = self.equalization_scale
        return dataclasses.replace(
            self,
            original_weight=self.original_weight.take_layer(l),
            equalization_scale=eq[l] if eq.ndim == 2 else eq,
        )
