"""Float8Array — fp8 quantized array (weights and activations).

Covers the reference's v2 ``Float8Tensor``
(``quantize_/workflows/float8/float8_tensor.py:73``) and the v1 AQT
``Float8Layout`` (``dtypes/floatx/float8_layout.py:63``): fp8 payload +
fp32 scale with a static granularity, plus an optional *activation quant
spec* stored on the weight so the linear dispatch quantizes activations on
the fly (the reference's ``act_quant_kwargs``-on-the-weight pattern,
``quant_api.py:1697-1714``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization import quant_primitives as qp


@dataclasses.dataclass(frozen=True)
class Float8ActQuantSpec:
    """Static description of how to quantize activations at dispatch time.

    Analog of ``QuantizeTensorToFloat8Kwargs`` (reference
    ``float8_tensor.py:46-70``). Hashable → usable as pytree aux data.
    """

    float8_dtype: str = "float8_e4m3fn"
    granularity: str = "per_row"  # per_row | per_tensor
    hp_value_lb: Optional[float] = None
    hp_value_ub: Optional[float] = None


@qarray_dataclass
class Float8Array(QuantizedArray):
    qdata: jnp.ndarray          # fp8
    scale: jnp.ndarray          # fp32, blocked shape
    block_size: Tuple[int, ...] = static_field()
    float8_dtype: str = static_field(default="float8_e4m3fn")
    act_quant_spec: Optional[Float8ActQuantSpec] = static_field(default=None)
    fast_accum: bool = static_field(default=True)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.qdata.shape

    @property
    def dtype(self):
        return jnp.dtype(self.activation_dtype)

    @classmethod
    def from_hp(
        cls,
        w: jnp.ndarray,
        block_size: Optional[Tuple[int, ...]] = None,
        float8_dtype: str = "float8_e4m3fn",
        act_quant_spec: Optional[Float8ActQuantSpec] = None,
        hp_value_lb: Optional[float] = None,
        hp_value_ub: Optional[float] = None,
        fast_accum: bool = True,
    ) -> "Float8Array":
        """Quantize a weight to fp8. ``block_size=None`` → per-row
        (rowwise) scales; ``()`` → per-tensor."""
        if block_size is None:
            block_size = tuple([1] * (w.ndim - 1) + [w.shape[-1]])
        scale = qp.choose_scale_float8(
            w,
            block_size,
            jnp.dtype(float8_dtype),
            hp_value_lb=hp_value_lb,
            hp_value_ub=hp_value_ub,
        )
        qdata = qp.quantize_affine_float8(w, scale, jnp.dtype(float8_dtype))
        return cls(
            qdata=qdata,
            scale=scale,
            block_size=tuple(block_size),
            float8_dtype=float8_dtype,
            act_quant_spec=act_quant_spec,
            fast_accum=fast_accum,
            activation_dtype=str(jnp.dtype(w.dtype)),
        )

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        return qp.dequantize_affine_float8(
            self.qdata, self.scale, output_dtype=output_dtype
        )


def quantize_activation_float8(
    x: jnp.ndarray, spec: Float8ActQuantSpec
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic activation fp8 quantization per the weight's spec. Returns
    (fp8 values, fp32 scale in blocked shape)."""
    if spec.granularity == "per_tensor":
        block_size: Tuple[int, ...] = tuple(x.shape)
    elif spec.granularity == "per_block_1x128":
        # DeepSeek-style activation blocks (1, 128) along features
        block_size = tuple([1] * (x.ndim - 1) + [min(128, x.shape[-1])])
    else:
        block_size = tuple([1] * (x.ndim - 1) + [x.shape[-1]])
    scale = qp.choose_scale_float8(
        x,
        block_size,
        jnp.dtype(spec.float8_dtype),
        hp_value_lb=spec.hp_value_lb,
        hp_value_ub=spec.hp_value_ub,
    )
    q = qp.quantize_affine_float8(x, scale, jnp.dtype(spec.float8_dtype))
    return q, scale
