"""Fused int4 dequant-matmul Pallas kernel.

TPU replacement for the reference's tinygemm path
(``aten._weight_int4pack_mm``,
``csrc/cuda/tensor_core_tiled_layout/tensor_core_tiled_layout.cu``) and the
Marlin/HQQ/gemlite int4 GPU kernels (SURVEY.md §2.7).

Design (tpu-first, not a translation):

- weights arrive in the half-split nibble layout (``qtypes/packing.py``):
  packed byte ``[n, kp]`` holds elements ``kp`` (low nibble) and
  ``kp + K/2`` (high nibble). A packed K-block therefore corresponds to
  two *contiguous* element blocks — the kernel reads the activation twice
  with different index maps (x_lo / x_hi) instead of doing any lane
  interleave: nibble unpack is two VPU ops (mask, shift) and dequant stays
  off the MXU critical path.
- grid (M/bm, N/bn, Kp/bkp) with an f32 VMEM accumulator; group scales
  and FLOAT-domain zeros (tinygemm semantics: ``dq = (q - 8)*s + z``) are
  expanded with ``pltpu.repeat`` along lanes.
- decode (M small) is the memory-bound GEMV case: block sizes chosen so
  each weight byte is read exactly once; the kernel streams N×K/2 bytes +
  scales, which is the HBM roofline for weight-only int4.

The jnp reference path (`int4_dq_matmul_reference`) is the correctness
oracle used by tests (also runs under ``interpret=True`` on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.qtypes.base import PackingFormat
from torchao_tpu.quantization.quant_primitives import ZeroPointDomain
from torchao_tpu.utils import cdiv


def _kernel(
    x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, z_lo_ref, z_hi_ref,
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int, mid: float,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = wp_ref[:]
    lo = (wp & 0xF).astype(jnp.bfloat16)
    hi = ((wp >> 4) & 0xF).astype(jnp.bfloat16)

    def dequant(q, s_ref, z_ref):
        # interleaved (per-group) expansion along lanes; NOTE pltpu.repeat
        # is tile-semantics (0123 0123), so use jnp.repeat (0000 1111)
        s = jnp.repeat(s_ref[:], group_size, axis=1)
        z = jnp.repeat(z_ref[:], group_size, axis=1)
        return (q - mid) * s + z

    dq_lo = dequant(lo, s_lo_ref, z_lo_ref)
    dq_hi = dequant(hi, s_hi_ref, z_hi_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_lo_ref[:], dq_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], dq_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "mid", "bm", "bn", "bkp", "interpret"),
)
def int4_dq_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32
    wp: jnp.ndarray,       # [N, K/2] uint8 half-split nibbles
    scale: jnp.ndarray,    # [N, K/g]
    zero: jnp.ndarray,     # [N, K/g] (FLOAT domain)
    *,
    group_size: int,
    mid: float = 8.0,
    bm: Optional[int] = None,
    bn: int = 256,
    bkp: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[m, n] = Σ_k x[m, k] · ((q[n, k] − mid)·s[n, k//g] + z[n, k//g])."""
    M, K = x.shape
    N, Kp = wp.shape
    assert Kp * 2 == K, (K, Kp)
    assert Kp % group_size == 0 or group_size >= Kp, (Kp, group_size)

    # clamp blocks to problem size; bkp must divide Kp exactly (the x_hi /
    # scale_hi index maps offset by a whole number of blocks) and be a
    # multiple of group_size so scale blocks align with groups
    import math as _math

    g_eff = min(group_size, Kp)
    bkp = _math.gcd(min(bkp, Kp), Kp)
    if bkp % g_eff != 0:
        bkp = _math.gcd(bkp * g_eff, Kp)
    assert Kp % bkp == 0 and bkp % g_eff == 0, (Kp, bkp, g_eff)
    bn = min(bn, N)
    if bm is None:
        bm = 8 if M <= 8 else min(256, M)
    bm = min(bm, M) if M % 8 == 0 or M < 8 else 8

    grid = (cdiv(M, bm), cdiv(N, bn), Kp // bkp)
    bg = bkp // g_eff
    group_size = g_eff

    kernel = functools.partial(
        _kernel, group_size=group_size, n_k_blocks=grid[2], mid=mid
    )
    sdtype = scale.dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k)),
            pl.BlockSpec(
                (bm, bkp), lambda i, j, k, _kb=Kp // bkp: (i, k + _kb)
            ),
            pl.BlockSpec((bn, bkp), lambda i, j, k: (j, k)),
            pl.BlockSpec((bn, bg), lambda i, j, k: (j, k)),
            pl.BlockSpec(
                (bn, bg), lambda i, j, k, _gb=Kp // group_size // bg: (j, k + _gb)
            ),
            pl.BlockSpec((bn, bg), lambda i, j, k: (j, k)),
            pl.BlockSpec(
                (bn, bg), lambda i, j, k, _gb=Kp // group_size // bg: (j, k + _gb)
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * N * K,
            bytes_accessed=N * Kp + scale.size * 2 * 2 + M * K * 2 * 2,
            transcendentals=0,
        ),
    )(
        x, x, wp,
        scale.astype(jnp.bfloat16), scale.astype(jnp.bfloat16),
        zero.astype(jnp.bfloat16), zero.astype(jnp.bfloat16),
    )
    return out


def int4_dq_matmul_reference(x, wp, scale, zero, *, group_size, mid=8.0):
    """jnp oracle with identical math."""
    from torchao_tpu.qtypes.packing import unpack_int4

    q = unpack_int4(wp, axis=-1).astype(jnp.bfloat16)
    N, K = q.shape
    s = jnp.repeat(scale.astype(jnp.bfloat16), group_size, axis=-1)
    z = jnp.repeat(zero.astype(jnp.bfloat16), group_size, axis=-1)
    dq = (q - mid) * s + z
    return jax.lax.dot_general(
        x, dq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# dispatch probe
# ---------------------------------------------------------------------------


def int4_dq_matmul_available(x, w):
    """Returns an impl callable when the Pallas kernel supports this case."""
    from torchao_tpu.qtypes.intx import IntxArray

    if not isinstance(w, IntxArray):
        return None
    if w.packing_format is not PackingFormat.TILED_NIBBLES:
        return None
    if w.zero_point_domain is not ZeroPointDomain.FLOAT:
        return None
    if w.qdata.ndim != 2 or w.zero_point is None:
        return None
    N, K = w.shape
    group_size = w.block_size[-1]
    Kp = K // 2
    if Kp % group_size != 0 and group_size < Kp:
        return None
    if K % 256 != 0 or N % 256 != 0:
        return None
    mid = (w.quant_max + w.quant_min + 1) / 2 - w.quant_min

    def impl(x, w):
        xb = x.reshape(-1, K)
        out = int4_dq_matmul(
            xb, w.qdata, w.scale, w.zero_point,
            group_size=group_size, mid=mid,
        )
        return out.reshape(x.shape[:-1] + (N,))

    return impl
