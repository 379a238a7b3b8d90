"""ParQ: piecewise-affine regularized quantization-aware training.

Covers the reference's ``torchao/prototype/parq``: instead of STE
fake-quant, weights are *pulled* onto the quantization grid by a
quadratic attraction ``λ‖W − dq(W)‖²`` whose proximal map interpolates
``W ← (W + λ·dq(W)) / (1 + λ)``; annealing λ → ∞ over training lands the
weights exactly on the grid, so the final hard quantization is lossless.
Also provides the regularizer form for loss-based use.

paretoq-style extreme low bit (1-2 bit) is reached by the same machinery
at ``bits ∈ {1, 2}`` (absmax grid), complementing BitNet in
``prototype/quantized_training``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig


@dataclasses.dataclass
class ParQConfig(AOBaseConfig):
    bits: int = 4
    group_size: int = 32
    lambda_start: float = 0.01
    lambda_end: float = 100.0
    version: int = 1


def _grid_quant_dequant(w: jnp.ndarray, bits: int, group_size: int):
    """Symmetric absmax grid quant-dequant per group along the last axis."""
    qmax = 2 ** (bits - 1) - 1 if bits > 1 else 1
    g = min(group_size, w.shape[-1])
    shp = w.shape
    blocks = w.reshape(*shp[:-1], -1, g).astype(jnp.float32)
    amax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(blocks / scale), -qmax - (bits > 1), qmax)
    return (q * scale).reshape(shp).astype(w.dtype)


def parq_prox_step(
    w: jnp.ndarray, lam: float, bits: int = 4, group_size: int = 32
) -> jnp.ndarray:
    """Proximal map of ``(λ/2)‖W − dq(W)‖²``: interpolate toward the grid.
    Apply after each optimizer step with λ annealed upward."""
    dq = _grid_quant_dequant(w, bits, group_size)
    return ((w.astype(jnp.float32) + lam * dq.astype(jnp.float32))
            / (1.0 + lam)).astype(w.dtype)


def parq_regularizer(
    w: jnp.ndarray, bits: int = 4, group_size: int = 32
) -> jnp.ndarray:
    """``‖W − sg(dq(W))‖²`` — the loss-term form (differentiable wrt W)."""
    dq = jax.lax.stop_gradient(_grid_quant_dequant(w, bits, group_size))
    return jnp.sum((w.astype(jnp.float32) - dq.astype(jnp.float32)) ** 2)


def lambda_schedule(step: int, total: int, config: ParQConfig) -> float:
    """Geometric annealing from lambda_start to lambda_end."""
    t = min(max(step / max(total - 1, 1), 0.0), 1.0)
    import math

    return float(
        math.exp(
            (1 - t) * math.log(config.lambda_start)
            + t * math.log(config.lambda_end)
        )
    )
