"""PARQ quantizers: uniform grid, ternary, LSBQ binary decomposition.

Functional JAX counterparts of the reference's
``prototype/parq/quant/`` (``uniform.py`` UnifQuantizer, ``lsbq.py``
LSBQuantizer / ternary optimal-v): each returns ``(dq, aux)`` where
``dq`` is the dequantized projection of ``w`` onto the quantizer's grid
— what the prox maps in ``proxmap.py`` pull weights toward.

The reference finds the ternary/2-bit optimal ``v`` by sorting each
channel and scanning cumulative means for the fixed point of
``v = E[|w| : |w| > v/2] / 2``-style conditions; here the same fixed
point is reached by Lloyd iterations (jit-friendly: no data-dependent
shapes), which converge in a handful of steps and match the scan's
optimum (tested against brute force).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_sign(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) with sign(0) := 1 (reference ``lsbq.binary_sign``)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def unif_quantize(
    w: jnp.ndarray, bits: int = 4, group_size: int = 32
) -> jnp.ndarray:
    """Symmetric absmax uniform grid per group along the last axis."""
    qmax = 2 ** (bits - 1) - 1 if bits > 1 else 1
    g = min(group_size, w.shape[-1])
    shp = w.shape
    blocks = w.reshape(*shp[:-1], -1, g).astype(jnp.float32)
    amax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = jnp.clip(jnp.round(blocks / scale), -qmax - (bits > 1), qmax)
    return (q * scale).reshape(shp).astype(w.dtype)


def ternary_quantize(
    w: jnp.ndarray, iters: int = 10
) -> jnp.ndarray:
    """Optimal per-row ternary ``v·{-1,0,1}`` (reference
    ``compute_v_per_channel(ternary=True)``): minimizes ‖w − v·t‖² via
    Lloyd iterations of  t = 1{|w| > v/2}·sign(w),
    v = mean(|w| over selected)."""
    a = jnp.abs(w.astype(jnp.float32))

    def body(v, _):
        sel = a > v / 2.0
        cnt = jnp.maximum(jnp.sum(sel, axis=-1, keepdims=True), 1)
        v = jnp.sum(jnp.where(sel, a, 0.0), axis=-1, keepdims=True) / cnt
        return v, None

    v0 = jnp.mean(a, axis=-1, keepdims=True)
    v, _ = jax.lax.scan(body, v0, None, length=iters)
    t = jnp.where(a > v / 2.0, binary_sign(w.astype(jnp.float32)), 0.0)
    return (v * t).astype(w.dtype)


def lsbq_quantize(
    w: jnp.ndarray, num_bits: int = 2
) -> jnp.ndarray:
    """Greedy least-squares binary decomposition (reference
    ``lsbq.py``): w ≈ Σᵢ vᵢ·sign(rᵢ) with vᵢ = mean|rᵢ| per row —
    each step is the optimal single-binary fit to the residue."""
    r = w.astype(jnp.float32)
    dq = jnp.zeros_like(r)
    for _ in range(num_bits):
        v = jnp.mean(jnp.abs(r), axis=-1, keepdims=True)
        b = v * binary_sign(r)
        dq = dq + b
        r = r - b
    return dq.astype(w.dtype)
