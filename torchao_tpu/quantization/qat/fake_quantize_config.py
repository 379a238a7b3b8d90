"""Fake-quantization configs for QAT.

Mirrors the reference's ``qat/fake_quantize_config.py``
(``FakeQuantizeConfigBase:39``, ``IntxFakeQuantizeConfig:81``,
``Float8FakeQuantizeConfig:48``): a hashable description of how to
fake-quantize activations or weights during training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
    choose_qparams_affine,
    choose_qparams_affine_tinygemm,
    fake_quantize_affine,
    per_token_block_size,
    qmin_qmax,
)


@dataclasses.dataclass(frozen=True)
class FakeQuantizeConfigBase(AOBaseConfig):
    pass


@dataclasses.dataclass(frozen=True)
class IntxFakeQuantizeConfig(FakeQuantizeConfigBase):
    """int1-8 fake quant: ``dtype`` + granularity (``group_size`` for
    per-group, None for per-channel/per-token)."""

    dtype: str = "int4"
    group_size: Optional[int] = None
    is_symmetric: bool = True
    is_dynamic: bool = True
    # tinygemm float-zero-point mode (matches Int4WeightOnlyConfig PTQ)
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT
    eps: Optional[float] = None
    version: int = 1


@dataclasses.dataclass(frozen=True)
class Float8FakeQuantizeConfig(FakeQuantizeConfigBase):
    dtype: str = "float8_e4m3fn"
    granularity: str = "per_row"
    version: int = 1


def apply_fake_quant(
    x: jnp.ndarray, config: FakeQuantizeConfigBase, is_weight: bool
) -> jnp.ndarray:
    """Differentiable (STE) fake quantization of an activation or weight."""
    if isinstance(config, Float8FakeQuantizeConfig):
        from torchao_tpu.quantization.quant_primitives import (
            choose_scale_float8,
        )

        if config.granularity == "per_tensor":
            block = tuple(x.shape)
        else:
            block = tuple([1] * (x.ndim - 1) + [x.shape[-1]])
        scale = choose_scale_float8(x, block, jnp.dtype(config.dtype))
        max_v = float(jnp.finfo(jnp.dtype(config.dtype)).max)
        from torchao_tpu.quantization.quant_primitives import (
            _expand_scale_to_tensor_shape,
        )

        scale_e = _expand_scale_to_tensor_shape(scale, x.shape)
        xq = jnp.clip(x.astype(jnp.float32) / scale_e, -max_v, max_v)
        # round-to-fp8 applied in the forward only (straight-through)
        rounded = xq.astype(jnp.dtype(config.dtype)).astype(jnp.float32)
        xq = xq + jax.lax.stop_gradient(rounded - xq)
        return (xq * scale_e).astype(x.dtype)

    assert isinstance(config, IntxFakeQuantizeConfig)
    if is_weight:
        if config.group_size is not None:
            block = tuple([1] * (x.ndim - 1) + [config.group_size])
        else:
            block = tuple([1] * (x.ndim - 1) + [x.shape[-1]])
    else:
        block = per_token_block_size(x)

    mapping = (
        MappingType.SYMMETRIC if config.is_symmetric
        else MappingType.ASYMMETRIC
    )
    if config.zero_point_domain is ZeroPointDomain.FLOAT:
        quant_min, quant_max = qmin_qmax(config.dtype)
        scale, zp = choose_qparams_affine_tinygemm(
            x, MappingType.ASYMMETRIC, block, config.dtype,
            eps=config.eps,
        )
        return fake_quantize_affine(
            x, block, scale, zp, config.dtype,
            zero_point_domain=ZeroPointDomain.FLOAT,
        )
    scale, zp = choose_qparams_affine(
        x, mapping, block, config.dtype, eps=config.eps
    )
    return fake_quantize_affine(x, block, scale, zp, config.dtype)


import jax  # noqa: E402
