"""Quantized training: int8 QT weights and BitNet b1.58.

Covers the reference's ``torchao/prototype/quantized_training``
(``int8.py:55`` Int8QuantizedTrainingLinearWeight, ``bitnet.py:44`` BitNet
b1.58): weights train through a quantized forward with STE —

- int8 QT: per-channel symmetric int8 quant-dequant of the weight each
  forward (stochastic rounding optional in the reference; deterministic
  round-to-even here).
- BitNet b1.58: ternary {−1, 0, +1}·absmean weights + int8 per-token
  activations.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization.quant_primitives import round_ste
from torchao_tpu.quantization.transform_module import (
    register_quantize_module_handler,
)


@qarray_dataclass
class QuantizedTrainingWeight(QuantizedArray):
    weight: jnp.ndarray  # hp master weight, trainable
    mode: str = static_field(default="int8")  # int8 | bitnet

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def quantized_forward_weight(self) -> jnp.ndarray:
        w = self.weight
        wf = w.astype(jnp.float32)
        if self.mode == "bitnet":
            # b1.58: scale = absmean, ternary round with STE
            scale = jnp.mean(jnp.abs(wf)) + 1e-8
            q = jnp.clip(round_ste(wf / scale), -1, 1)
            return (q * scale).astype(w.dtype)
        # int8 per-channel symmetric
        amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(round_ste(wf / scale), -127, 127)
        return (q * scale).astype(w.dtype)

    def dequantize(self, output_dtype=None):
        w = self.quantized_forward_weight()
        return w if output_dtype is None else w.astype(output_dtype)


@dataclasses.dataclass
class Int8WeightOnlyQuantizedTrainingConfig(AOBaseConfig):
    version: int = 1


@dataclasses.dataclass
class BitNetTrainingConfig(AOBaseConfig):
    version: int = 1


@register_quantize_module_handler(Int8WeightOnlyQuantizedTrainingConfig)
def _int8_qt_transform(w, config):
    return QuantizedTrainingWeight(weight=w, mode="int8")


@register_quantize_module_handler(BitNetTrainingConfig)
def _bitnet_transform(w, config):
    return QuantizedTrainingWeight(weight=w, mode="bitnet")


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch
    from torchao_tpu.quantization.quant_primitives import (
        quantize_activation_per_token_absmax,
    )

    if any(n == "quantized_training" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, QuantizedTrainingWeight)

    def impl(x, w, bias, preference):
        wq = w.quantized_forward_weight()
        if w.mode == "bitnet":
            # int8 per-token act fake-quant with STE
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            s = jnp.maximum(amax, 1e-12) / 127.0
            xq = jnp.clip(round_ste(xf / s), -127, 127) * s
            x = xq.astype(x.dtype)
        out = jnp.matmul(x, wq.T)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("quantized_training", check, impl)


_register_dispatch()
