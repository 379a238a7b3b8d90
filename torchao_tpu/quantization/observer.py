"""Observers for static (calibration-based) PTQ.

Functional re-design of the reference's observer stack
(``torchao/quantization/observer.py``: ``AffineQuantizedObserverBase:89``,
``AffineQuantizedMinMaxObserver:144``, ``AffineQuantizedMSEObserver:248``)
for JAX: an observer is a small pytree of running statistics plus pure
``update(state, x) -> state`` / ``calculate_qparams(state)`` functions —
calibration is a ``lax.scan``/loop over batches, no module mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from torchao_tpu.quantization.granularity import Granularity
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
    choose_qparams_affine_with_min_max,
    get_reduction_params,
    qmin_qmax,
)


@dataclasses.dataclass(frozen=True)
class ObserverConfig:
    mapping_type: MappingType = MappingType.ASYMMETRIC
    target_dtype: str = "int8"
    granularity: Optional[Granularity] = None
    quant_min: Optional[Union[int, float]] = None
    quant_max: Optional[Union[int, float]] = None
    eps: Optional[float] = None
    scale_dtype: Optional[str] = None
    zero_point_dtype: Optional[str] = None
    preserve_zero: bool = True
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT


@dataclasses.dataclass
class MinMaxObserverState:
    min_val: Optional[jnp.ndarray] = None
    max_val: Optional[jnp.ndarray] = None


def _block_size(config: ObserverConfig, shape) -> Tuple[int, ...]:
    if config.granularity is None:
        return tuple(shape)
    return tuple(config.granularity.block_size(shape))


def minmax_update(
    state: MinMaxObserverState, x: jnp.ndarray, config: ObserverConfig
) -> MinMaxObserverState:
    """Running min/max per block (reference MinMax observer ``:144``)."""
    block_size = _block_size(config, x.shape)
    shape_for_reduction, reduction_dims = get_reduction_params(
        block_size, x.shape
    )
    xr = x.reshape(shape_for_reduction)
    mn = jnp.min(xr, axis=tuple(reduction_dims))
    mx = jnp.max(xr, axis=tuple(reduction_dims))
    if state.min_val is None:
        return MinMaxObserverState(mn, mx)
    return MinMaxObserverState(
        jnp.minimum(state.min_val, mn), jnp.maximum(state.max_val, mx)
    )


def minmax_calculate_qparams(
    state: MinMaxObserverState, config: ObserverConfig
):
    assert state.min_val is not None, "observer never saw data"
    return choose_qparams_affine_with_min_max(
        state.min_val,
        state.max_val,
        config.mapping_type,
        (),  # block handled by the reduced stats already
        config.target_dtype,
        config.quant_min,
        config.quant_max,
        config.eps,
        jnp.dtype(config.scale_dtype) if config.scale_dtype else None,
        jnp.dtype(config.zero_point_dtype)
        if config.zero_point_dtype
        else None,
        preserve_zero=config.preserve_zero,
        zero_point_domain=config.zero_point_domain,
    )


@dataclasses.dataclass
class MSEObserverState:
    """Grid-searches a clipping ratio minimizing quant-dequant MSE
    (reference ``AffineQuantizedMSEObserver:248``)."""

    min_val: Optional[jnp.ndarray] = None
    max_val: Optional[jnp.ndarray] = None
    steps: int = 20


def mse_update(
    state: MSEObserverState, x: jnp.ndarray, config: ObserverConfig
) -> MSEObserverState:
    """Per-batch: search clip ∈ (0, 1] minimizing per-block MSE of the
    clipped quant-dequant; keep the running min/max of the best clips."""
    from torchao_tpu.quantization import quant_primitives as qp

    block_size = _block_size(config, x.shape)
    shape_for_reduction, reduction_dims = get_reduction_params(
        block_size, x.shape
    )
    xr = x.reshape(shape_for_reduction)
    rd = tuple(reduction_dims)
    mn0 = jnp.min(xr, axis=rd)
    mx0 = jnp.max(xr, axis=rd)
    qmin, qmax = qmin_qmax(
        config.target_dtype, config.quant_min, config.quant_max
    )

    best_mse = None
    best = (mn0, mx0)
    for i in range(state.steps):
        # geometric clip sweep 1.0 → 0.01 (outliers can be 100× the bulk)
        r = 0.01 ** (i / max(state.steps - 1, 1))
        mn, mx = mn0 * r, mx0 * r
        scale, zp = qp.choose_qparams_affine_with_min_max(
            mn, mx, config.mapping_type, (), config.target_dtype,
            config.quant_min, config.quant_max, config.eps,
        )
        se = scale
        for d in sorted(rd):
            se = jnp.expand_dims(se, d)
        ze = zp
        for d in sorted(rd):
            ze = jnp.expand_dims(ze, d)
        q = jnp.clip(jnp.round(xr / se) + ze, qmin, qmax)
        dq = (q - ze) * se
        mse = jnp.mean((dq - xr) ** 2, axis=rd)
        if best_mse is None:
            best_mse, best = mse, (mn, mx)
        else:
            take = mse < best_mse
            best_mse = jnp.where(take, mse, best_mse)
            best = (
                jnp.where(take, mn, best[0]),
                jnp.where(take, mx, best[1]),
            )

    mn_b, mx_b = best
    if state.min_val is None:
        return MSEObserverState(mn_b, mx_b, state.steps)
    return MSEObserverState(
        jnp.minimum(state.min_val, mn_b),
        jnp.maximum(state.max_val, mx_b),
        state.steps,
    )


mse_calculate_qparams = minmax_calculate_qparams


@dataclasses.dataclass
class MovingAvgObserverState:
    min_val: Optional[jnp.ndarray] = None
    max_val: Optional[jnp.ndarray] = None
    averaging_constant: float = 0.01


def moving_avg_update(
    state: MovingAvgObserverState, x: jnp.ndarray, config: ObserverConfig
) -> MovingAvgObserverState:
    block_size = _block_size(config, x.shape)
    shape_for_reduction, reduction_dims = get_reduction_params(
        block_size, x.shape
    )
    xr = x.reshape(shape_for_reduction)
    mn = jnp.min(xr, axis=tuple(reduction_dims))
    mx = jnp.max(xr, axis=tuple(reduction_dims))
    a = state.averaging_constant
    if state.min_val is None:
        return MovingAvgObserverState(mn, mx, a)
    return MovingAvgObserverState(
        state.min_val + a * (mn - state.min_val),
        state.max_val + a * (mx - state.max_val),
        a,
    )
