"""AWQ: activation-aware weight quantization.

Covers the reference's ``torchao/prototype/awq`` (``api.py``, ``core.py``):
per-in-channel scales ``s = absmax_x^alpha`` searched over an alpha grid
to minimize the quantized-linear output error on calibration data; the
chosen scale multiplies the weight before group-wise intx quantization and
divides the activation at inference (same equalization mechanism as
smoothquant, different objective).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.composition import (
    WeightTensorWithLinearActivationScaleMetadata,
)
from torchao_tpu.quantization.smoothquant import (
    LinearActivationWeightObservedArray,
    insert_smoothquant_observers_,
)
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)

# AWQ reuses the activation-absmax observer flow
insert_awq_observers_ = insert_smoothquant_observers_


@dataclasses.dataclass
class AWQConfig(AOBaseConfig):
    base_config: Optional[AOBaseConfig] = None
    alpha_grid: Sequence[float] = (0.0, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9)
    version: int = 1


def awq_search_scales(
    w: jnp.ndarray,
    act_absmax: jnp.ndarray,
    base_config: AOBaseConfig,
    alpha_grid: Sequence[float],
) -> jnp.ndarray:
    """Pick alpha minimizing ‖(x̂·W)−(x̂·dq(W·s)/s)‖ ∝ weighted weight
    error, using act_absmax as the importance proxy (the reference's
    search objective, ``awq/core.py``)."""
    handler = get_quantize_handler(base_config)
    ax = jnp.maximum(act_absmax.astype(jnp.float32), 1e-5)
    best_err, best_scale = None, None
    for alpha in alpha_grid:
        s = ax ** alpha
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))  # normalize (awq trick)
        ws = (w.astype(jnp.float32) * s[None, :]).astype(w.dtype)
        qw = handler(ws, base_config)
        if isinstance(qw, jnp.ndarray):
            continue
        dq = qw.dequantize(jnp.float32) / s[None, :]
        # importance-weighted error
        err = float(
            jnp.mean(((dq - w.astype(jnp.float32)) * ax[None, :]) ** 2)
        )
        if best_err is None or err < best_err:
            best_err, best_scale = err, s
    assert best_scale is not None
    return best_scale


def convert_awq_(params, config: AWQConfig):
    """Replace observed weights with AWQ-scaled quantized weights."""
    from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

    base = config.base_config or Int4WeightOnlyConfig(group_size=128)

    def convert(leaf):
        if not isinstance(leaf, LinearActivationWeightObservedArray):
            return leaf
        w = leaf.weight
        stats = leaf.stats
        if stats is None or stats.absmax is None:
            return get_quantize_handler(base)(w, base)
        s = awq_search_scales(
            w, jnp.asarray(stats.absmax), base, config.alpha_grid
        )
        ws = (w.astype(jnp.float32) * s[None, :]).astype(w.dtype)
        inner = get_quantize_handler(base)(ws, base)
        if isinstance(inner, jnp.ndarray):
            return inner
        return WeightTensorWithLinearActivationScaleMetadata(
            original_weight=inner, equalization_scale=s.astype(w.dtype)
        )

    return jax.tree_util.tree_map(
        convert, params,
        is_leaf=lambda x: isinstance(
            x, LinearActivationWeightObservedArray
        ) or not isinstance(x, (dict, list, tuple)),
    )
