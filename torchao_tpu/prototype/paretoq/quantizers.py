"""ParetoQ learned-step-size quantizers (custom-VJP).

TPU-native re-implementation of the reference's autograd functions
(``torchao/prototype/paretoq/models/utils_quant.py``):

- :func:`lsq_quantize` — ``LsqBinaryTernaryExtension`` (:19): LSQ-style
  fake quant with a LEARNED per-row (or per-layer) step size ``alpha``;
  straight-through on the weight inside the clip range, and the LSQ
  alpha gradient ``(q̂ − q)·g·grad_scale`` with saturation terms Qn/Qp.
- :func:`stretched_elastic_quantize` — ``StretchedElasticQuant``
  (:107): the stretched/shifted grid used for 0 (ternary "1.58-bit")
  and 2-bit, with matching gradients.

Bit-width semantics match the reference's ``QuantizeLinear.forward``
(:261): bits>=16 passthrough; 1-bit sign; 0/2 stretched-elastic;
3/4 LSQ.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-5
_CLIP = 1 - 1e-2


def _grad_scale(numel: int, qp: int) -> float:
    return 1.0 / math.sqrt(numel * qp) if qp else 1.0 / math.sqrt(numel)


def _reduce_like_alpha(g, layerwise):
    if layerwise:
        return jnp.sum(g).reshape(1)
    return jnp.sum(g, axis=-1, keepdims=True)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lsq_quantize(w, alpha, bits: int, layerwise: bool = False):
    out, _ = _lsq_fwd(w, alpha, bits, layerwise)
    return out


def _lsq_fwd(w, alpha, bits, layerwise):
    if bits >= 16:
        return w, (w, alpha)
    alpha = jnp.maximum(alpha, _EPS)
    if bits == 1:
        wq = jnp.sign(w) * alpha
    else:
        qn = -(2 ** (bits - 1))
        qp = 2 ** (bits - 1) - 1
        q = jnp.clip(jnp.round(w / alpha), qn, qp)
        wq = q * alpha
    return wq.astype(w.dtype), (w, alpha)


def _lsq_bwd(bits, layerwise, res, g):
    w, alpha = res
    if bits >= 16:
        return g, jnp.zeros_like(alpha)
    alpha = jnp.maximum(alpha, _EPS)
    if bits == 1:
        # reference: Qn/Qp = ±1 → grad_scale 1/sqrt(numel), alpha grad
        # from sign(w), weight grad CLIPPED to |w/α| ≤ 1 (STE window)
        gs = _grad_scale(w.size, 0)
        ga = _reduce_like_alpha(jnp.sign(w) * g * gs, layerwise)
        qw = w / alpha
        mid = ((qw >= -1) & (qw <= 1)).astype(g.dtype)
        return mid * g, ga.reshape(alpha.shape)
    qn = -(2 ** (bits - 1))
    qp = 2 ** (bits - 1) - 1
    gs = _grad_scale(w.size, qp)
    qw = w / alpha
    small = (qw < qn).astype(g.dtype)
    big = (qw > qp).astype(g.dtype)
    mid = 1.0 - small - big
    ga = _reduce_like_alpha(
        (small * qn + big * qp + mid * (jnp.round(qw) - qw)) * g * gs,
        layerwise,
    )
    return mid * g, ga.reshape(alpha.shape)


lsq_quantize.defvjp(_lsq_fwd, _lsq_bwd)


def _se_grid(bits):
    if bits == 0:
        return 1.5, 0.0     # ternary: levels ±2/3, 0
    return float(2 ** (bits - 1)), 0.5


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stretched_elastic_quantize(w, alpha, bits: int,
                               layerwise: bool = False):
    out, _ = _se_fwd(w, alpha, bits, layerwise)
    return out


def _se_fwd(w, alpha, bits, layerwise):
    if bits >= 16:
        return w, (w, alpha)
    alpha = jnp.maximum(alpha, _EPS)
    n_levels, shift = _se_grid(bits)
    if bits == 1:
        q = jnp.sign(w)
    else:
        q = (
            jnp.round(
                jnp.clip(w / alpha, -_CLIP, _CLIP) * n_levels - shift
            ) + shift
        ) / n_levels
    return (q * alpha).astype(w.dtype), (w, alpha)


def _se_bwd(bits, layerwise, res, g):
    w, alpha = res
    if bits >= 16:
        return g, jnp.zeros_like(alpha)
    alpha = jnp.maximum(alpha, _EPS)
    n_levels, shift = _se_grid(bits)
    qp_eff = (n_levels - shift) / n_levels
    qn_eff = -qp_eff
    qp_int = 2 ** (bits - 1) - 1 if bits >= 2 else 0
    gs = _grad_scale(w.size, qp_int)
    qw = w / alpha
    small = (qw < -_CLIP).astype(g.dtype)
    big = (qw > _CLIP).astype(g.dtype)
    mid = 1.0 - small - big
    if bits == 1:
        ga = _reduce_like_alpha(jnp.sign(w) * g * gs, layerwise)
        return g, ga.reshape(alpha.shape)
    qhat = (
        jnp.round(jnp.clip(qw, -_CLIP, _CLIP) * n_levels - shift) + shift
    ) / n_levels
    ga = _reduce_like_alpha(
        (small * qn_eff + big * qp_eff + mid * (qhat - qw)) * g * gs,
        layerwise,
    )
    return mid * g, ga.reshape(alpha.shape)


stretched_elastic_quantize.defvjp(_se_fwd, _se_bwd)


def paretoq_fake_quantize(w, alpha, bits: int, layerwise: bool = False):
    """Bit-width dispatch matching the reference's
    ``QuantizeLinear.forward`` (utils_quant.py:261-283)."""
    if bits >= 16:
        return w
    if bits in (0, 2):
        return stretched_elastic_quantize(w, alpha, bits, layerwise)
    if bits <= 4:
        return lsq_quantize(w, alpha, bits, layerwise)
    raise NotImplementedError(f"w_bits={bits}")


def init_clip_val(w, bits: int) -> jnp.ndarray:
    """Per-row alpha init (reference train.py:44-57): 1-bit mean|w|;
    0/2-bit max|w|; 3/4-bit max|w|/maxq."""
    absw = jnp.abs(w.astype(jnp.float32))
    if bits == 1:
        a = jnp.mean(absw, axis=-1, keepdims=True)
    elif bits in (0, 2):
        a = jnp.max(absw, axis=-1, keepdims=True)
    elif bits in (3, 4):
        maxq = 2 ** (bits - 1) - 1
        a = jnp.max(absw, axis=-1, keepdims=True) / maxq
    else:
        raise NotImplementedError(f"w_bits={bits}")
    return jnp.maximum(a, _EPS).astype(w.dtype)
