"""FloatxArray — sub-byte ExMy float weights (fp6-LLM family), emulated.

Covers the reference's floatx tensor-core layout
(``torchao/dtypes/floatx/floatx_tensor_core_layout.py:457``) at the API
level. The GPU bit-interleaved packing + ``quant_llm_linear`` kernel
(``csrc/cuda/fp6_llm/``) is a documented non-goal on TPU (SURVEY.md §2.7);
values are stored on the ExMy grid in bf16 with per-row power-of-two
scales, so memory savings are not realized but numerics (and therefore
perplexity) match the fp6 path exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization import quant_primitives as qp


@qarray_dataclass
class FloatxArray(QuantizedArray):
    qdata: jnp.ndarray  # values on the ExMy grid, stored bf16
    scale: jnp.ndarray  # per-row power-of-two scale
    ebits: int = static_field(default=3)
    mbits: int = static_field(default=2)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.qdata.shape

    @classmethod
    def from_hp(cls, w: jnp.ndarray, ebits: int, mbits: int) -> "FloatxArray":
        scale = qp.choose_qparams_affine_floatx(w, ebits, mbits)
        q = qp.quantize_affine_floatx(w, scale, ebits, mbits)
        return cls(
            qdata=q.astype(jnp.bfloat16),
            scale=scale,
            ebits=ebits,
            mbits=mbits,
            activation_dtype=str(jnp.dtype(w.dtype)),
        )

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        return qp.dequantize_affine_floatx(
            self.qdata, self.scale, self.ebits, self.mbits,
            output_dtype=output_dtype,
        )
