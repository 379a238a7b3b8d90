"""Float8 training linear: 3-gemm custom-VJP with per-gemm cast configs.

Re-design of the reference's ``Float8Linear`` /
``matmul_with_hp_or_float8_args`` (``float8_linear.py:29-205``) as a
``jax.custom_vjp`` function: forward casts input and weight to e4m3 and
runs the output gemm; backward casts grad_output to e5m2 and runs the
grad_input and grad_weight gemms, each operand with its own
``CastConfig`` (TENSORWISE or AXISWISE scaling, optional hp bypass).

Under a sharded mesh the fp8 casts happen *before* XLA's all-gathers, so
fp8 all-gather (the reference's FSDP2 ``WeightWithDynamicFloat8CastTensor``
trick, ``fsdp_utils.py:28``) falls out of sharding propagation for free.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.float8.config import (
    CastConfig,
    Float8LinearConfig,
    ScalingGranularity,
)
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)


def _cast_fp8(
    t: jnp.ndarray,
    cfg: Optional[CastConfig],
    axis: int,
    round_pow2: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cast to fp8 with a scale; returns (values_hp_equivalent, None) when
    cfg keeps high precision. ``axis`` is the contraction axis for
    AXISWISE scaling (scale computed along it)."""
    if cfg is None or cfg.dtype is None:
        return t, None
    dtype = jnp.dtype(cfg.dtype)
    fp8_max = float(jnp.finfo(dtype).max)
    t32 = t.astype(jnp.float32)
    if cfg.scaling_granularity is ScalingGranularity.TENSORWISE:
        amax = jnp.max(jnp.abs(t32))
    else:
        amax = jnp.max(jnp.abs(t32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / fp8_max
    if round_pow2:
        # round the divisor UP so values never clip (the reference floors
        # its reciprocal multiplier — same thing)
        scale = jnp.exp2(jnp.ceil(jnp.log2(scale)))
    q = jnp.clip(t32 / scale, -fp8_max, fp8_max).astype(dtype)
    return q, scale


def _scaled_mm(a, a_scale, b, b_scale, dims):
    """dot_general on (possibly fp8) operands with f32 accumulation and
    scale epilogue."""
    acc = jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32,
    )
    if a_scale is not None:
        # a contracted on dims[0][0]: scale broadcasts over output rows
        acc = acc * _squeeze_to(a_scale, acc.ndim, 0)
    if b_scale is not None:
        acc = acc * _squeeze_to(b_scale, acc.ndim, 1)
    return acc


def _squeeze_to(scale, out_ndim, operand_idx):
    """Reshape an axiswise scale for the output: operand 0 scales map to
    output rows, operand 1 scales to output cols. Tensorwise scales are
    scalars and broadcast trivially."""
    s = jnp.squeeze(scale)
    if s.ndim == 0:
        return s
    if operand_idx == 0:
        return s.reshape(-1, 1)
    return s.reshape(1, -1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def float8_linear(
    x: jnp.ndarray,        # [..., K]
    w: jnp.ndarray,        # [N, K]
    config: Float8LinearConfig = Float8LinearConfig(),
) -> jnp.ndarray:
    out, _ = _fwd(x, w, config)
    return out


def _fwd(x, w, config: Float8LinearConfig):
    rp2 = config.round_scales_to_power_of_2
    x2 = x.reshape(-1, x.shape[-1])
    xq, xs = _cast_fp8(x2, config.cast_config_input, 1, rp2)
    wq, ws = _cast_fp8(w, config.cast_config_weight, 1, rp2)
    out = _scaled_mm(xq, xs, wq, ws, (((1,), (1,)), ((), ())))
    out = out.reshape(x.shape[:-1] + (w.shape[0],)).astype(x.dtype)
    return out, (x, w)


def _bwd(config: Float8LinearConfig, res, g):
    x, w = res
    rp2 = config.round_scales_to_power_of_2
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    x2 = x.reshape(-1, x.shape[-1])

    # grad_input = g @ w       (contract over N)
    gq, gs = _cast_fp8(g2, config.cast_config_grad_output, 1, rp2)
    wq2, ws2 = _cast_fp8(w, config.cast_config_weight, 0, rp2)
    dx = _scaled_mm(gq, gs, wq2, ws2, (((1,), (0,)), ((), ())))
    dx = dx.reshape(x.shape).astype(x.dtype)

    # grad_weight = gᵀ @ x     (contract over tokens)
    cc_g = (
        config.cast_config_grad_output_for_grad_weight
        if config.cast_config_grad_output_for_grad_weight is not None
        else config.cast_config_grad_output
    )
    cc_x = (
        config.cast_config_input_for_grad_weight
        if config.cast_config_input_for_grad_weight is not None
        else config.cast_config_input
    )
    gq2, gs2 = _cast_fp8(g2, cc_g, 0, rp2)
    xq2, xs2 = _cast_fp8(x2, cc_x, 0, rp2)
    dw = _scaled_mm(
        jnp.swapaxes(gq2, 0, 1), gs2,
        jnp.swapaxes(xq2, 0, 1), xs2,
        (((1,), (1,)), ((), ())),
    )
    dw = dw.astype(w.dtype)
    return dx, dw


float8_linear.defvjp(
    lambda x, w, config: _fwd(x, w, config),
    _bwd,
)


def _cast_fp8_with_scale(t, cfg, scale):
    dtype = jnp.dtype(cfg.dtype)
    fp8_max = float(jnp.finfo(dtype).max)
    q = jnp.clip(
        t.astype(jnp.float32) / scale, -fp8_max, fp8_max
    ).astype(dtype)
    return q, scale


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def float8_linear_with_wscale(
    x: jnp.ndarray,
    w: jnp.ndarray,
    w_scale: jnp.ndarray,   # precomputed tensorwise weight scale
    config: Float8LinearConfig = Float8LinearConfig(),
) -> jnp.ndarray:
    out, _ = _fwd_ws(x, w, w_scale, config)
    return out


def _fwd_ws(x, w, w_scale, config):
    rp2 = config.round_scales_to_power_of_2
    x2 = x.reshape(-1, x.shape[-1])
    xq, xs = _cast_fp8(x2, config.cast_config_input, 1, rp2)
    wq, ws = _cast_fp8_with_scale(w, config.cast_config_weight, w_scale)
    out = _scaled_mm(xq, xs, wq, ws, (((1,), (1,)), ((), ())))
    out = out.reshape(x.shape[:-1] + (w.shape[0],)).astype(x.dtype)
    return out, (x, w, w_scale)


def _bwd_ws(config, res, g):
    x, w, w_scale = res
    # the scale is derived data (stop-grad in the reference): reuse the
    # standard backward and emit a zero cotangent for it
    dx, dw = _bwd(config, (x, w), g)
    return dx, dw, jnp.zeros_like(w_scale)


float8_linear_with_wscale.defvjp(
    lambda x, w, w_scale, config: _fwd_ws(x, w, w_scale, config),
    _bwd_ws,
)


# ---------------------------------------------------------------------------
# training weight wrapper + conversion
# ---------------------------------------------------------------------------


@qarray_dataclass
class Float8TrainingWeight(QuantizedArray):
    """Trainable hp weight + a Float8LinearConfig; qlinear dispatch routes
    through :func:`float8_linear` (the module-swap analog of
    ``convert_to_float8_training``, reference
    ``float8_linear_utils.py:86``)."""

    weight: jnp.ndarray
    # tensorwise weight scale precomputed after the optimizer step so a
    # sharded (FSDP-style) cast-then-all-gather needs no extra amax
    # collective (reference ``precompute_float8_dynamic_scale_for_fsdp``,
    # fsdp_utils.py) — None means compute in-forward as usual
    precomputed_scale: Optional[jnp.ndarray] = None
    config: Float8LinearConfig = static_field(
        default_factory=Float8LinearConfig
    )

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def dequantize(self, output_dtype=None):
        w = self.weight
        return w if output_dtype is None else w.astype(output_dtype)


def precompute_float8_dynamic_scale_for_fsdp(params):
    """Fill each ``Float8TrainingWeight``'s tensorwise scale from the
    current weights (call after the optimizer step; the forward then
    skips the amax pass — and under FSDP sharding the amax reduction
    happens here, once, instead of inside every forward)."""
    import dataclasses as _dc

    def fix(leaf):
        if not isinstance(leaf, Float8TrainingWeight):
            return leaf
        cfg = leaf.config.cast_config_weight
        if (
            cfg is None or cfg.dtype is None
            or cfg.scaling_granularity is not ScalingGranularity.TENSORWISE
        ):
            return leaf
        fp8_max = float(jnp.finfo(jnp.dtype(cfg.dtype)).max)
        amax = jnp.max(jnp.abs(leaf.weight.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-12) / fp8_max
        if leaf.config.round_scales_to_power_of_2:
            scale = jnp.exp2(jnp.ceil(jnp.log2(scale)))
        return _dc.replace(leaf, precomputed_scale=scale)

    return jax.tree_util.tree_map(
        fix, params,
        is_leaf=lambda l: isinstance(l, Float8TrainingWeight),
    )


def convert_to_float8_training(
    params,
    config: Optional[Float8LinearConfig] = None,
    filter_fn=None,
):
    """Wrap matched linear weights for fp8 training (reference
    ``convert_to_float8_training``, ``float8_linear_utils.py:86``)."""
    from torchao_tpu.quantization.quant_api import _default_filter, _path_str

    if config is None:
        config = Float8LinearConfig()
    if filter_fn is None:
        filter_fn = _default_filter

    def wrap(kp, leaf):
        if not filter_fn(_path_str(kp), leaf):
            return leaf
        return Float8TrainingWeight(weight=leaf, config=config)

    return jax.tree_util.tree_map_with_path(
        wrap, params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(n == "float8_training" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, Float8TrainingWeight)

    def impl(x, w, bias, preference):
        if w.precomputed_scale is not None:
            out = float8_linear_with_wscale(
                x, w.weight, w.precomputed_scale, w.config
            )
        else:
            out = float8_linear(x, w.weight, w.config)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("float8_training", check, impl)


_register_dispatch()
