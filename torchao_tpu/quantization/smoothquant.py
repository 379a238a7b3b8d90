"""SmoothQuant: activation-outlier smoothing + int8 dynamic quantization.

Covers the reference's smoothquant implementations
(``torchao/quantization/smoothquant.py`` module swap and
``torchao/prototype/smoothquant/api.py`` config flow): per-in-channel
smoothing factor ``s = amax_x^alpha / amax_w^(1-alpha)`` is divided out of
activations and multiplied into weights before int8 quantization, carried
at inference by ``WeightTensorWithLinearActivationScaleMetadata``.

Calibration is eager-mode: ``insert_smoothquant_observers_`` wraps weights
in an observed array whose dispatch records per-channel activation absmax
on the host; run the model on calibration batches *without jit*, then
``convert_smoothquant_`` produces the final quantized params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.qtypes.composition import (
    WeightTensorWithLinearActivationScaleMetadata,
)
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)


class _ActStats:
    """Host-side running absmax accumulator (hashable by identity, so it
    rides in a static field; eager-mode only — the JAX analog of the
    reference's inserted observer modules)."""

    def __init__(self):
        self.absmax: Optional[np.ndarray] = None
        self.count = 0

    def update(self, x: jnp.ndarray):
        a = np.max(
            np.abs(np.asarray(x, np.float32)).reshape(-1, x.shape[-1]),
            axis=0,
        )
        self.absmax = a if self.absmax is None else np.maximum(self.absmax, a)
        self.count += 1


@qarray_dataclass
class LinearActivationWeightObservedArray(QuantizedArray):
    """Weight wrapper recording activation stats during calibration
    (reference ``LinearActivationWeightObservedTensor``,
    ``linear_activation_weight_observed_tensor.py``)."""

    weight: jnp.ndarray
    stats: Any = static_field(default=None)

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def dequantize(self, output_dtype=None):
        w = self.weight
        return w if output_dtype is None else w.astype(output_dtype)


def _observed_linear_impl(x, w, bias, preference):
    if w.stats is not None:
        w.stats.update(x)
    out = jnp.matmul(x, w.weight.T)
    return out + bias if bias is not None else out


def _register_observed_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(name == "act_observed" for name, _, _ in _DISPATCH):
        return
    register_qlinear_dispatch(
        "act_observed",
        lambda x, w, b: isinstance(w, LinearActivationWeightObservedArray),
        _observed_linear_impl,
    )


_register_observed_dispatch()


@dataclasses.dataclass
class SmoothQuantConfig(AOBaseConfig):
    """alpha-smoothing + a base int8 config (reference
    ``prototype/smoothquant/api.py`` SmoothQuantConfig)."""

    base_config: Optional[AOBaseConfig] = None
    step: str = "prepare"  # prepare | convert
    alpha: float = 0.5
    version: int = 1


def insert_smoothquant_observers_(
    params, filter_fn: Optional[Callable] = None
):
    """Wrap matched weights with activation observers. Returns (params,
    {path: stats}) — run the model eagerly on calibration data next."""
    from torchao_tpu.quantization.quant_api import _default_filter, _path_str

    if filter_fn is None:
        filter_fn = _default_filter
    stats_map: Dict[str, _ActStats] = {}

    def wrap(kp, leaf):
        path = _path_str(kp)
        if not filter_fn(path, leaf):
            return leaf
        st = _ActStats()
        stats_map[path] = st
        return LinearActivationWeightObservedArray(weight=leaf, stats=st)

    out = jax.tree_util.tree_map_with_path(
        wrap, params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )
    return out, stats_map


def convert_smoothquant_(
    params,
    config: SmoothQuantConfig,
):
    """Replace observed weights with smoothed+quantized weights."""
    from torchao_tpu.quantization.quant_api import (
        Int8DynamicActivationInt8WeightConfig,
    )

    base = config.base_config or Int8DynamicActivationInt8WeightConfig()
    alpha = config.alpha

    def convert(leaf):
        if not isinstance(leaf, LinearActivationWeightObservedArray):
            return leaf
        w = leaf.weight
        stats = leaf.stats
        if stats is None or stats.absmax is None:
            return get_quantize_handler(base)(w, base)
        amax_x = jnp.asarray(stats.absmax, jnp.float32)
        amax_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(range(w.ndim - 1)))
        eps = 1e-5
        s = jnp.clip(amax_x, eps, None) ** alpha / jnp.clip(
            amax_w, eps, None
        ) ** (1 - alpha)
        s = jnp.clip(s, eps, None)
        w_smoothed = (w.astype(jnp.float32) * s[None, :]).astype(w.dtype)
        inner = get_quantize_handler(base)(w_smoothed, base)
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
