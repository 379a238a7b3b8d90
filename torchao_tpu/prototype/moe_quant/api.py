"""MoE quantization.

Covers the reference's ``torchao/prototype/moe_quant`` — there,
``FakeExtraDimTensor`` (``moe_quant/utils.py:26``) fakes a leading expert
dim over a linked list of 2-D quantized subclasses because torch tensor
subclasses can't batch. Here quantized arrays are pytrees whose leaves
carry leading dims natively (the same mechanism that stacks layers), so
``MoEQuantConfig(base_config)`` just applies the base handler to the
stacked ``[E, N, K]`` expert weight — no fake-dim machinery needed.

``quantized_grouped_linear`` is the expert-parallel matmul: tokens sorted
by expert, one ``jax.lax.ragged_dot`` over the dequantized expert stack
(XLA's native grouped GEMM on TPU), replacing the reference's fp8 grouped
GEMM kernels (``moe_training/scaled_grouped_mm.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import QuantizedArray
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)


@dataclasses.dataclass
class MoEQuantConfig(AOBaseConfig):
    base_config: Optional[AOBaseConfig] = None
    version: int = 1


@register_quantize_module_handler(MoEQuantConfig)
def _moe_quant_transform(w, config: MoEQuantConfig):
    assert config.base_config is not None
    # stacked expert weight [E, N, K]: base handlers are N-D aware
    return get_quantize_handler(config.base_config)(w, config.base_config)


def quantized_grouped_linear(
    x_sorted: jnp.ndarray,      # [T, K] tokens sorted by expert
    group_sizes: jnp.ndarray,   # [E] tokens per expert
    w,                          # [E, N, K] array or QuantizedArray
) -> jnp.ndarray:
    """Grouped (ragged) linear: row block ``e`` of ``x_sorted`` multiplies
    expert ``e``'s weight. Dequantizes the expert stack and uses
    ``jax.lax.ragged_dot`` (TPU-native grouped GEMM)."""
    if isinstance(w, QuantizedArray):
        wd = w.dequantize(x_sorted.dtype)
    else:
        wd = w
    # ragged_dot wants rhs [G, K, N]
    rhs = jnp.swapaxes(wd, -1, -2)
    return jax.lax.ragged_dot(x_sorted, rhs, group_sizes)
