"""GPTQ: Hessian-based error-compensated weight quantization.

Covers the reference's ``torchao/quantization/GPTQ/GPTQ.py`` (1,043 LoC:
``MultiTensor`` calibration capture + per-group Hessian solve +
``Int4WeightOnlyGPTQQuantizer``). The torch version threads calibration
batches through ``__torch_function__``; in JAX calibration is explicit —
accumulate per-linear Hessians ``H = Σ xᵀx`` however you run the model,
then call :func:`gptq_quantize_weight` per weight. The solver is the
standard GPTQ column sweep (quantize column, propagate the weighted error
into the remaining columns via the Cholesky factor of H⁻¹), expressed as a
``lax.fori_loop`` so it jits.

Group-wise qparams are recomputed at each group boundary from the
*error-compensated* weights, with tinygemm FLOAT-zero-point semantics by
default for ``Int4WeightOnlyConfig`` perplexity parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
)


def _cholesky_inv_upper(H: jnp.ndarray, damp_frac: float = 0.01):
    """Upper Cholesky factor of H⁻¹ with diagonal damping."""
    K = H.shape[0]
    damp = damp_frac * jnp.mean(jnp.diag(H))
    Hd = H + jnp.eye(K, dtype=H.dtype) * damp
    # inv via Cholesky solve for stability
    L = jnp.linalg.cholesky(Hd)
    Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(K, dtype=H.dtype))
    # upper factor U with Hinv = Uᵀ U — its rows drive error propagation
    U = jnp.linalg.cholesky(Hinv).T
    return U


@dataclasses.dataclass(frozen=True)
class GPTQQuantSpec:
    target_dtype: str = "uint4"
    quant_min: int = 0
    quant_max: int = 15
    group_size: int = 64
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.FLOAT
    eps: float = 1e-6


def gptq_quantize_weight(
    W: jnp.ndarray,        # [N, K]
    H: jnp.ndarray,        # [K, K] = Σ xᵀ x over calibration tokens
    spec: GPTQQuantSpec = GPTQQuantSpec(),
    damp_frac: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (q [N, K] int storage, scale [N, K/g], zero [N, K/g])."""
    N, K = W.shape
    g = min(spec.group_size, K)
    assert K % g == 0
    G = K // g
    qmin, qmax = float(spec.quant_min), float(spec.quant_max)
    mid = (qmax + qmin + 1) / 2

    Wf = W.astype(jnp.float32)
    U = _cholesky_inv_upper(H.astype(jnp.float32), damp_frac)

    def quantize_col(w_col, scale, zero):
        if spec.zero_point_domain is ZeroPointDomain.FLOAT:
            min_val = zero - scale * mid
            q = jnp.clip(jnp.round((w_col - min_val) / scale), qmin, qmax)
            dq = (q - mid) * scale + zero
        else:
            q = jnp.clip(jnp.round(w_col / scale) + zero, qmin, qmax)
            dq = (q - zero) * scale
        return q, dq

    def group_qparams(Wg):
        """qparams from the (error-compensated) group block [N, g]."""
        mn = jnp.min(Wg, axis=1)
        mx = jnp.max(Wg, axis=1)
        if spec.zero_point_domain is ZeroPointDomain.FLOAT:
            scale = (mx - mn) / (qmax - qmin)
            scale = jnp.maximum(scale, spec.eps)
            zero = mn + scale * mid
        else:
            mn_c = jnp.minimum(mn, 0.0)
            mx_c = jnp.maximum(mx, 0.0)
            scale = (mx_c - mn_c) / (qmax - qmin)
            scale = jnp.maximum(scale, spec.eps)
            zero = jnp.clip(qmin - jnp.round(mn_c / scale), qmin, qmax)
        return scale, zero

    def body(i, carry):
        Wbuf, Q, scales, zeros = carry
        gi = i // g

        def new_group(_):
            Wg = jax.lax.dynamic_slice(Wbuf, (0, gi * g), (N, g))
            s, z = group_qparams(Wg)
            return (
                jax.lax.dynamic_update_slice(scales, s[:, None], (0, gi)),
                jax.lax.dynamic_update_slice(zeros, z[:, None], (0, gi)),
            )

        scales, zeros = jax.lax.cond(
            i % g == 0,
            new_group,
            lambda _: (scales, zeros),
            None,
        )
        s_i = jax.lax.dynamic_slice(scales, (0, gi), (N, 1))[:, 0]
        z_i = jax.lax.dynamic_slice(zeros, (0, gi), (N, 1))[:, 0]

        w_i = jax.lax.dynamic_slice(Wbuf, (0, i), (N, 1))[:, 0]
        q_i, dq_i = quantize_col(w_i, s_i, z_i)

        u_ii = U[i, i]
        err = (w_i - dq_i) / u_ii
        # propagate into columns > i: W[:, j] -= err * U[i, j]
        u_row = U[i, :]  # zeros at <= i except diagonal handled by mask
        mask = (jnp.arange(K) > i).astype(Wf.dtype)
        Wbuf = Wbuf - err[:, None] * (u_row * mask)[None, :]
        Q = jax.lax.dynamic_update_slice(Q, q_i[:, None], (0, i))
        return (Wbuf, Q, scales, zeros)

    Q0 = jnp.zeros((N, K), jnp.float32)
    s0 = jnp.ones((N, G), jnp.float32)
    z0 = jnp.zeros((N, G), jnp.float32)
    _, Q, scales, zeros = jax.lax.fori_loop(
        0, K, body, (Wf, Q0, s0, z0)
    )
    return Q, scales, zeros


def accumulate_hessian(
    H: Optional[jnp.ndarray], x: jnp.ndarray
) -> jnp.ndarray:
    """H += xᵀx over all leading dims (x: [..., K])."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    delta = x2.T @ x2
    return delta if H is None else H + delta


def gptq_quantize_int4(
    W: jnp.ndarray,
    H: jnp.ndarray,
    group_size: int = 64,
    scale_dtype=jnp.bfloat16,
):
    """Int4WeightOnlyGPTQQuantizer equivalent: produce a tinygemm-semantics
    IntxArray (TILED_NIBBLES K-major) from W and its Hessian."""
    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray
    from torchao_tpu.qtypes.packing import pack_int4

    spec = GPTQQuantSpec(group_size=group_size)
    Q, scales, zeros = gptq_quantize_weight(W, H, spec)
    from torchao_tpu.qtypes.intx import _tiled_eff_qparams_chunked

    qdata = jnp.swapaxes(
        pack_int4(Q.astype(jnp.uint8), axis=-1) ^ jnp.uint8(0x80),
        -1, -2,
    )
    scale_t = jnp.swapaxes(scales.astype(scale_dtype), -1, -2)
    zero_t = jnp.swapaxes(zeros.astype(scale_dtype), -1, -2)
    qe, qchunk = _tiled_eff_qparams_chunked(
        scale_t, zero_t, 0, 15, ZeroPointDomain.FLOAT, group_size
    )
    return IntxArray(
        qdata=qdata,
        scale=scale_t,
        zero_point=zero_t,
        block_size=tuple([1] * (W.ndim - 1) + [group_size]),
        target_dtype="uint4",
        quant_min=0,
        quant_max=15,
        zero_point_domain=ZeroPointDomain.FLOAT,
        packing_format=PackingFormat.TILED_NIBBLES,
        logical_shape=tuple(W.shape),
        activation_dtype=str(jnp.dtype(W.dtype)),
        qparams_eff=qe,
        qparams_eff_chunk=qchunk,
        nibbles_xored=True,
    )
