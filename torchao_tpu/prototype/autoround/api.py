"""AutoRound: sign-gradient optimization of rounding decisions.

Covers the reference's ``torchao/prototype/autoround`` (Intel AutoRound):
a per-element rounding offset ``V ∈ [−0.5, 0.5]`` is trained with signSGD
to minimize the layer's output error on calibration activations;
``q = clamp(round(w/s + zp + V))``. Expressed as a jitted ``lax.scan``
over optimization steps.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    choose_qparams_affine,
    round_ste,
)


@dataclasses.dataclass
class AutoRoundConfig(AOBaseConfig):
    bits: int = 4
    group_size: int = 128
    iters: int = 200
    lr: float = 0.005
    version: int = 1


def autoround_quantize_weight(
    w: jnp.ndarray,          # [N, K]
    x_calib: jnp.ndarray,    # [T, K]
    config: AutoRoundConfig = AutoRoundConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (q int8-storage values, scale, zero_point) with group-wise
    symmetric qparams and optimized rounding."""
    g = min(config.group_size, w.shape[-1])
    block = (1, g)
    qmax = 2 ** (config.bits - 1) - 1
    qmin = -(2 ** (config.bits - 1))
    scale, zp = choose_qparams_affine(
        w, MappingType.SYMMETRIC, block, f"int{config.bits}",
    )
    N, K = w.shape
    s_e = jnp.repeat(scale.astype(jnp.float32), g, axis=-1)
    wf = w.astype(jnp.float32)
    x32 = x_calib.astype(jnp.float32)
    ref = x32 @ wf.T

    def dq(V):
        q = jnp.clip(round_ste(wf / s_e + V), qmin, qmax)
        return q * s_e

    def loss(V):
        return jnp.mean((x32 @ dq(V).T - ref) ** 2)

    grad = jax.grad(loss)

    # signSGD with linearly decayed lr, tracking the best iterate by true
    # quantized loss (AutoRound's schedule; a fixed step size oscillates
    # across rounding thresholds and can end worse than RTN)
    def step(carry, i):
        V, bestV, bestL = carry
        lr = config.lr * (1.0 - i / config.iters)
        gV = grad(V)
        V = jnp.clip(V - lr * jnp.sign(gV), -0.5, 0.5)
        L = loss(V)
        better = L < bestL
        bestV = jnp.where(better, V, bestV)
        bestL = jnp.where(better, L, bestL)
        return (V, bestV, bestL), None

    V0 = jnp.zeros_like(wf)
    (V, bestV, _), _ = jax.lax.scan(
        step, (V0, V0, loss(V0)), jnp.arange(config.iters)
    )
    q = jnp.clip(jnp.round(wf / s_e + bestV), qmin, qmax).astype(jnp.int8)
    return q, scale, zp
