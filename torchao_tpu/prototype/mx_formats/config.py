"""MX format configs + quantize_ handlers + MX training linear.

Reference: ``torchao/prototype/mx_formats/config.py`` (``MXLinearConfig:124``)
and ``inference_workflow.py`` (``MXFPInferenceConfig:38``,
``NVFP4InferenceConfig:130``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.quantization.transform_module import (
    register_quantize_module_handler,
)


@dataclasses.dataclass
class MXLinearConfig(AOBaseConfig):
    """MX training: cast input/weight/grad to an MX format per gemm
    (emulated on TPU)."""

    elem_dtype: str = "fp8_e4m3"
    elem_dtype_weight_override: Optional[str] = None
    elem_dtype_grad_output_override: Optional[str] = None
    block_size: int = 32
    version: int = 1


@dataclasses.dataclass
class MXFPInferenceConfig(AOBaseConfig):
    """MX weight (+ dynamic MX activation) inference."""

    activation_dtype: str = "fp8_e4m3"
    weight_dtype: str = "fp8_e4m3"
    block_size: int = 32
    version: int = 1


@dataclasses.dataclass
class NVFP4InferenceConfig(AOBaseConfig):
    block_size: int = 16
    version: int = 1


@register_quantize_module_handler(MXFPInferenceConfig)
def _mxfp_inference_transform(w, config: MXFPInferenceConfig):
    from torchao_tpu.prototype.mx_formats.mx_tensor import to_mx

    if w.shape[-1] % config.block_size != 0:
        return w
    return to_mx(w, config.weight_dtype, config.block_size)


@register_quantize_module_handler(NVFP4InferenceConfig)
def _nvfp4_inference_transform(w, config: NVFP4InferenceConfig):
    from torchao_tpu.prototype.mx_formats.mx_tensor import to_nvfp4

    if w.shape[-1] % config.block_size != 0:
        return w
    return to_nvfp4(w, config.block_size)


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch
    from torchao_tpu.prototype.mx_formats.mx_tensor import (
        MXArray,
        NVFP4Array,
        to_mx,
    )

    if any(n == "mx_inference" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, (MXArray, NVFP4Array))

    def impl(x, w, bias, preference):
        # dynamic MX activation cast + dequant matmul (emulated gemm)
        if isinstance(w, MXArray):
            xq = to_mx(x, w.elem_dtype, w.block_size).dequantize(x.dtype)
        else:
            xq = x
        out = jnp.matmul(xq, w.dequantize(x.dtype).T)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("mx_inference", check, impl)


_register_dispatch()
