"""fp8 grouped (ragged) matmul for MoE training.

Covers the reference's ``torchao/prototype/moe_training/scaled_grouped_mm.py``
(``_scaled_grouped_mm`` autograd, ``:30-271``): the expert-parallel matmul
with both operands dynamically cast to fp8 rowwise, differentiable — a
``jax.custom_vjp`` over ``jax.lax.ragged_dot``:

  fwd:  y  = ragged_dot(cast(x), cast(W))           (per-expert groups)
  bwd:  dx = ragged_dot(cast(g), cast(W)ᵀ)
        dW = per-group  cast(g)ᵀ · cast(x)

Group sizes are static-shape-friendly: ragged_dot carries them as data.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

E4M3_MAX = 448.0


def _cast_rowwise(t: jnp.ndarray, axis: int):
    t32 = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(t32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
    q = jnp.clip(t32 / scale, -E4M3_MAX, E4M3_MAX).astype(
        jnp.float8_e4m3fn
    )
    return q, scale


@jax.custom_vjp
def fp8_scaled_grouped_mm(
    x: jnp.ndarray,            # [T, K] tokens sorted by expert
    w: jnp.ndarray,            # [E, N, K] expert weights (hp, trainable)
    group_sizes: jnp.ndarray,  # [E]
) -> jnp.ndarray:
    out, _ = _fwd(x, w, group_sizes)
    return out


def _fwd(x, w, group_sizes):
    xq, xs = _cast_rowwise(x, 1)            # per-token
    wq, ws = _cast_rowwise(w, 2)            # per-(expert, out-row)
    acc = jax.lax.ragged_dot(
        xq.astype(jnp.bfloat16),
        jnp.swapaxes(wq.astype(jnp.bfloat16), 1, 2),  # [E, K, N]
        group_sizes,
    ).astype(jnp.float32)
    # epilogue: token scale × expert-row scale (gathered per token group)
    token_expert = jnp.repeat(
        jnp.arange(w.shape[0]), group_sizes.astype(jnp.int32),
        total_repeat_length=x.shape[0],
    )
    out = acc * xs * ws[token_expert, :, 0]
    return out.astype(x.dtype), (x, w, group_sizes)


def _bwd(res, g):
    x, w, group_sizes = res
    T, K = x.shape
    E, N, _ = w.shape
    g32 = g.astype(jnp.float32)

    # dx = ragged_dot(g, W) with fp8 casts (e5m2 for grads per reference)
    gq, gs = _cast_rowwise(g32, 1)
    wq, ws = _cast_rowwise(w, 1)  # per-(expert, in-col) for the transpose
    dx = jax.lax.ragged_dot(
        gq.astype(jnp.bfloat16),
        wq.astype(jnp.bfloat16),   # [E, N, K] contracting N
        group_sizes,
    ).astype(jnp.float32)
    token_expert = jnp.repeat(
        jnp.arange(E), group_sizes.astype(jnp.int32),
        total_repeat_length=T,
    )
    dx = dx * gs * ws[token_expert, 0, :]
    dx = dx.astype(x.dtype)

    # dW[e] = g_eᵀ @ x_e — segment matmul via one-hot-free masking:
    # build per-token expert mask rows and use two dense matmuls
    # (E is small; cost E·T·max(N,K) — fine for training batches)
    onehot = (
        token_expert[:, None] == jnp.arange(E)[None, :]
    ).astype(jnp.float32)  # [T, E]
    gx = jnp.einsum("tn,te->etn", g32, onehot)
    dw = jnp.einsum("etn,tk->enk", gx, x.astype(jnp.float32))
    return dx, dw.astype(w.dtype), None


fp8_scaled_grouped_mm.defvjp(_fwd, _bwd)
