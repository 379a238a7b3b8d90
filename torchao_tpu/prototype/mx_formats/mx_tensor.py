"""MXArray — OCP Microscaling (MX) formats, emulated for TPU.

Covers the reference's ``torchao/prototype/mx_formats/mx_tensor.py``
(``MXTensor:466``, ``to_mx:133``): a block of 32 elements shares one e8m0
(power-of-two) scale; elements are fp8_e4m3 / fp6_e3m2 / fp6_e2m3 /
fp4_e2m1. Blackwell's native MX gemms don't exist on TPU, so elements are
stored on their ExMy grid (fp8 natively; fp6/fp4 value-gridded in fp8
storage — numerics exact, memory savings partial) and matmuls run after
dequant — the reference's own "emulated" kernel choice
(``config.py:20`` MXGemmKernelChoice.EMULATED).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)

# elem dtype → (ebits, mbits, max_normal)
_ELEM_FORMATS = {
    "fp8_e4m3": (4, 3, 448.0),
    "fp8_e5m2": (5, 2, 57344.0),
    "fp6_e3m2": (3, 2, 28.0),
    "fp6_e2m3": (2, 3, 7.5),
    "fp4_e2m1": (2, 1, 6.0),
}

E8M0_EXP_BIAS = 127


def _round_to_exmy(x32: jnp.ndarray, ebits: int, mbits: int, max_normal: float):
    """Round fp32 to the ExMy grid (with subnormals), staying in fp32."""
    exp_bias = 2 ** (ebits - 1) - 1
    sign = jnp.sign(x32)
    mag = jnp.minimum(jnp.abs(x32), max_normal)
    exp = jnp.floor(jnp.log2(jnp.maximum(mag, 1e-45)))
    exp = jnp.maximum(exp, 1 - exp_bias)  # subnormal floor
    quantum = jnp.exp2(exp - mbits)
    return sign * jnp.round(mag / quantum) * quantum


@qarray_dataclass
class MXArray(QuantizedArray):
    qdata: jnp.ndarray          # element values on the ExMy grid
    scale_exp: jnp.ndarray      # uint8 e8m0 biased exponents, blocked shape
    elem_dtype: str = static_field(default="fp8_e4m3")
    block_size: int = static_field(default=32)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return self.qdata.shape

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        scale = jnp.exp2(
            self.scale_exp.astype(jnp.float32) - E8M0_EXP_BIAS
        )
        scale = jnp.repeat(scale, self.block_size, axis=-1)
        return (self.qdata.astype(jnp.float32) * scale).astype(output_dtype)


def to_mx(
    x: jnp.ndarray,
    elem_dtype: str = "fp8_e4m3",
    block_size: int = 32,
) -> MXArray:
    """Cast to an MX format (reference ``to_mx``, ``mx_tensor.py:133``):
    shared scale exponent = floor(log2(amax)) − emax(elem), stored e8m0."""
    ebits, mbits, max_normal = _ELEM_FORMATS[elem_dtype]
    assert x.shape[-1] % block_size == 0, (x.shape, block_size)
    x32 = x.astype(jnp.float32)
    blocks = x32.reshape(*x.shape[:-1], -1, block_size)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    emax_elem = jnp.floor(jnp.log2(max_normal))
    shared_exp = jnp.floor(jnp.log2(jnp.maximum(amax, 1e-38))) - emax_elem
    shared_exp = jnp.clip(shared_exp, -E8M0_EXP_BIAS, E8M0_EXP_BIAS + 1)
    scale = jnp.exp2(shared_exp)

    scaled = blocks / scale[..., None]
    q = _round_to_exmy(scaled, ebits, mbits, max_normal)
    q = q.reshape(x.shape)
    storage = (
        jnp.float8_e4m3fn if elem_dtype == "fp8_e4m3"
        else jnp.float8_e5m2 if elem_dtype == "fp8_e5m2"
        else jnp.bfloat16  # fp6/fp4 grids are exactly representable in bf16
    )
    return MXArray(
        qdata=q.astype(storage),
        scale_exp=(shared_exp + E8M0_EXP_BIAS).astype(jnp.uint8),
        elem_dtype=elem_dtype,
        block_size=block_size,
        activation_dtype=str(jnp.dtype(x.dtype)),
    )


@qarray_dataclass
class NVFP4Array(QuantizedArray):
    """NVFP4: fp4_e2m1 elements, fp8_e4m3 scales per 16-block (reference
    ``NVFP4InferenceConfig``, ``inference_workflow.py:130``)."""

    qdata: jnp.ndarray
    scale: jnp.ndarray  # fp8 e4m3 per-16 block scales
    block_size: int = static_field(default=16)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return self.qdata.shape

    def dequantize(self, output_dtype=None):
        if output_dtype is None:
            output_dtype = self.dtype
        s = jnp.repeat(
            self.scale.astype(jnp.float32), self.block_size, axis=-1
        )
        return (self.qdata.astype(jnp.float32) * s).astype(output_dtype)


def to_nvfp4(x: jnp.ndarray, block_size: int = 16) -> NVFP4Array:
    x32 = x.astype(jnp.float32)
    blocks = x32.reshape(*x.shape[:-1], -1, block_size)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 6.0  # fp4 e2m1 max = 6
    scale_fp8 = scale.astype(jnp.float8_e4m3fn)
    scale_used = scale_fp8.astype(jnp.float32)
    q = _round_to_exmy(
        blocks / jnp.maximum(scale_used, 1e-12)[..., None], 2, 1, 6.0
    )
    return NVFP4Array(
        qdata=q.reshape(x.shape).astype(jnp.bfloat16),
        scale=scale_fp8,
        block_size=block_size,
        activation_dtype=str(jnp.dtype(x.dtype)),
    )
