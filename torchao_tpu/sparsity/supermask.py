"""Supermask: learned sparsity masks over frozen weights.

Covers the reference's ``torchao/sparsity/supermask.py``: each weight gets
a trainable score tensor; the forward mask keeps the top ``1 − sparsity``
fraction of scores (straight-through gradient to the scores), so the mask
itself is learned while weights stay fixed (or co-train).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)


def _topk_mask(scores: jnp.ndarray, sparsity: float) -> jnp.ndarray:
    flat = scores.reshape(-1)
    k_keep = max(1, int(round(flat.shape[0] * (1.0 - sparsity))))
    thresh = jnp.sort(flat)[-k_keep]
    return (scores >= thresh).astype(scores.dtype)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def apply_supermask(w: jnp.ndarray, scores: jnp.ndarray, sparsity: float):
    return w * _topk_mask(scores, sparsity)


def _fwd(w, scores, sparsity):
    mask = _topk_mask(scores, sparsity)
    return w * mask, (w, mask)


def _bwd(sparsity, res, g):
    w, mask = res
    # STE: scores receive the full gradient signal w·g (as if the mask
    # were identity), weights receive the masked gradient
    return g * mask, g * w


apply_supermask.defvjp(_fwd, _bwd)


@qarray_dataclass
class SupermaskWeight(QuantizedArray):
    weight: jnp.ndarray
    scores: jnp.ndarray
    sparsity: float = static_field(default=0.5)

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def masked_weight(self) -> jnp.ndarray:
        return apply_supermask(self.weight, self.scores, self.sparsity)

    def dequantize(self, output_dtype=None):
        w = self.masked_weight()
        return w if output_dtype is None else w.astype(output_dtype)


def to_supermask(w: jnp.ndarray, sparsity: float = 0.5, key=None):
    if key is None:
        key = jax.random.PRNGKey(0)
    scores = jnp.abs(w).astype(jnp.float32) + 1e-6 * jax.random.normal(
        key, w.shape, jnp.float32
    )
    return SupermaskWeight(
        weight=w, scores=scores, sparsity=float(sparsity)
    )


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(n == "supermask" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, SupermaskWeight)

    def impl(x, w, bias, preference):
        out = jnp.matmul(x, w.masked_weight().T)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("supermask", check, impl)


_register_dispatch()
