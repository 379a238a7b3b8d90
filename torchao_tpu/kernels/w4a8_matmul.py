"""W4A8 fused matmul: int8 activations × packed-int4 weights.

Covers the reference's CUTLASS ``s8s4_linear_cutlass`` path
(``Int8DynamicActivationInt4WeightConfig``, 8da4w) — SURVEY.md §7
"W4A8 = int4 weight unpack into same [int8] kernel".

The TPU insight (vs the bf16 int4wo kernel, which is VPU-cast-bound —
see PERF.md/ROADMAP): with *integer* activations the nibble unpack can
ride the MXU almost entirely:

- only ``lo = b & 0xF`` is computed per byte on the VPU (one u8 AND —
  two weight elements); no shifts, no int→float casts;
- the hi nibble is never materialized: with packed byte
  ``b = lo + 16·hi``,  ``Σ x·hi = (Σ x·b − Σ x·lo) / 16``
  — one extra int8 MXU matmul against the raw bytes (plus a high-bit
  correction for the i8 reinterpret) and an exact arithmetic shift;
- the uint-nibble offset (q = nib − 8) folds into ``− 8·Σ x`` via a
  ones matmul (the same MXU zero-correction style as the int4 kernel).

Per-group weight scales are applied on int32 *group partials*: each
K-block covers 8 scale groups (Mosaic's minimum scale-row block), the
kernel statically unrolls those 8 sub-matmuls and accumulates
``ws[g, n] · partial_g`` in f32. VPU cost ≈ bm·bn per group — ~bm/g of
the bf16 kernel's per-element dequant work.

out[m, n] = xs[m] · Σ_g ws[g, n] · Σ_{k∈g} xq[m, k] · (nib[n, k] − 8)

Weights use the same K-major TILED_NIBBLES layout as the int4 kernel
(qdata [K/2, N] uint8 half-split, scales [K/g, N]); activations are
int8 with per-row (per-token) scales
(`quantize_activation_per_token_absmax`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv


def _kernel(
    x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref,
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    bkp = wp_ref.shape[0]
    n_groups = bkp // g

    wp = wp_ref[:]                                   # [bkp, bn] u8
    lo = (wp & jnp.uint8(0xF)).astype(jnp.int8)      # VPU: 1 AND / byte
    b_i8 = jax.lax.bitcast_convert_type(wp, jnp.int8)
    # high-bit mask without comparisons (Mosaic rejects i8 compares):
    # m_i8 = bitcast(b & 0x80) ∈ {0, −128}, so Σx·neg = −Σx·m/128 and
    # Σx·b_u8 = Σx·b_i8 + 256·Σx·neg = Σx·b_i8 − 2·Σx·m
    m_i8 = jax.lax.bitcast_convert_type(
        wp & jnp.uint8(0x80), jnp.int8
    )

    bn = lo.shape[1]
    # one wide weight matrix for the hi path: [bkp, 3·bn] = [lo | b | m]
    # — a single MXU dot per group instead of three (compile + dispatch
    # cost scale with op count on this toolchain)
    cat = jnp.concatenate([lo, b_i8, m_i8], axis=1)

    def half(x_ref, s_ref, use_hi: bool):
        x = x_ref[:]                                 # [bm, bkp] i8
        s = s_ref[:].astype(jnp.float32)             # [n_groups, bn]
        for gi in range(n_groups):                   # static unroll
            xs_g = x[:, gi * g:(gi + 1) * g]
            sl = slice(gi * g, (gi + 1) * g)
            if use_hi:
                wide = jax.lax.dot_general(
                    xs_g, cat[sl, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                    # [bm, 3·bn]
                p_lo = wide[:, :bn]
                # hi = (b_u8 − lo)/16, Σx·b_u8 = Σx·b_i8 − 2·Σx·m
                num = (
                    wide[:, bn:2 * bn] - 2 * wide[:, 2 * bn:] - p_lo
                )
                p = jax.lax.shift_right_arithmetic(num, 4)
            else:
                p = jax.lax.dot_general(
                    xs_g, lo[sl, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            row_sum = jnp.sum(
                xs_g.astype(jnp.int32), axis=1, keepdims=True
            )                                        # [bm, 1] = Σx
            p = p - 8 * row_sum                      # q = nib − 8
            acc_ref[:] += p.astype(jnp.float32) * s[gi:gi + 1, :]

    half(x_lo_ref, s_lo_ref, use_hi=False)
    half(x_hi_ref, s_hi_ref, use_hi=True)

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "bm", "bn", "bkp",
                     "interpret"),
)
def w4a8_dq_matmul(
    x_q: jnp.ndarray,      # [M, K] int8 (per-token quantized acts)
    x_scale: jnp.ndarray,  # [M] f32 per-token act scales
    wp: jnp.ndarray,       # [K/2, N] uint8, K-major half-split nibbles
    w_scale: jnp.ndarray,  # [K/g, N] group scales (uint4 nibs, mid=8)
    *,
    group_size: int,
    out_dtype=jnp.bfloat16,
    bm: Optional[int] = None,
    bn: int = 1024,
    bkp: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[m,n] = xs[m]·Σ_k xq[m,k]·(nib[n,k] − 8)·ws[k//g, n]."""
    M, K = x_q.shape
    Kp, N = wp.shape
    assert Kp * 2 == K, (K, Kp)
    g = group_size
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    row_mult = 1 if interpret else 8
    assert g <= Kp and Kp % (row_mult * g) == 0, (Kp, g)

    if bkp is None:
        # 8 groups per body: the kernel statically unrolls bkp/g group
        # sub-matmuls, so large bkp inflates the program; 8 is the
        # Mosaic scale-row minimum and keeps the unroll tight.
        bkp = 8 * g
    bkp = min(bkp, Kp)
    bkp = math.gcd(bkp, Kp)
    if bkp % (row_mult * g) != 0:
        bkp = row_mult * g
    bn = min(bn, N)
    if bm is None:
        bm = 8 if M <= 8 else min(256, M)
    bm = min(bm, M) if (M % 8 == 0 or M < 8) else 8

    nbk = Kp // bkp
    bg = bkp // g
    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(
        _kernel, group_size=g, n_k_blocks=nbk
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k + nbk)),
            pl.BlockSpec((bkp, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k + nbk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * M * N * K,
            bytes_accessed=Kp * N + w_scale.size * 4 + M * K,
            transcendentals=0,
        ),
    )(x_q, x_q, wp, w_scale.astype(jnp.float32),
      w_scale.astype(jnp.float32))
    return (
        out * x_scale.reshape(-1, 1).astype(jnp.float32)
    ).astype(out_dtype)


def w4a8_dq_matmul_reference(
    x_q, x_scale, wp, w_scale, *, group_size, out_dtype=jnp.bfloat16
):
    """jnp oracle with identical math (exact int32 group partials)."""
    from torchao_tpu.qtypes.packing import unpack_int4

    nib = unpack_int4(wp.T, axis=-1).astype(jnp.int32)  # [N, K] 0..15
    q = nib - 8
    K = x_q.shape[1]
    g = group_size
    xg = x_q.astype(jnp.int32).reshape(x_q.shape[0], K // g, g)
    qg = q.reshape(q.shape[0], K // g, g)
    part = jnp.einsum("mgk,ngk->mng", xg, qg)
    out = jnp.sum(
        part.astype(jnp.float32)
        * w_scale.T.astype(jnp.float32)[None, :, :],
        axis=-1,
    )
    return (
        out * x_scale.reshape(-1, 1).astype(jnp.float32)
    ).astype(out_dtype)


# ---------------------------------------------------------------------------
# dispatch probe
# ---------------------------------------------------------------------------


def w4a8_dq_matmul_available(w):
    """Impl factory when the kernel supports this weight (TILED_NIBBLES
    K-major uint4 with INT-domain symmetric groups, aligned shapes)."""
    import os

    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray
    from torchao_tpu.quantization.quant_primitives import ZeroPointDomain

    # OFF by default: measured on this v5e slice the per-group int8
    # sub-matmuls (K=32 each) serialize on the MXU — 29.5 ms/matmul at
    # the 8B FFN shape vs ~3.2 ms for the bf16 int4 kernel — so the
    # QDQ-act + int4-Pallas route wins (see ops/qlinear._impl_laqt).
    # The kernel is integer-exact (4.5e-7 rel err on hw); opt in with
    # TORCHAO_TPU_ENABLE_PALLAS_W4A8=1 on hardware where many small
    # int8 matmuls pipeline well.
    if os.environ.get("TORCHAO_TPU_ENABLE_PALLAS_W4A8") != "1":
        return None
    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_W4A8") == "1":
        return None
    if not isinstance(w, IntxArray):
        return None
    if w.packing_format is not PackingFormat.TILED_NIBBLES:
        return None
    if getattr(w, "nibbles_xored", False):
        # pre-XORed bytes: ride the batched-int8 int4 kernel instead
        # (the 8da4w centered-act dispatch handles this weight)
        return None
    if w.qdata.ndim != 2:
        return None
    N, K = w.shape
    Kp = K // 2
    group_size = w.block_size[-1]
    if group_size > Kp or Kp % (8 * group_size) != 0:
        return None
    if Kp % 128 != 0 or N % 128 != 0:
        return None
    # symmetric (no zero point) only: TILED_NIBBLES stores nib = q − qmin
    # (= q + 8), which is exactly the kernel's q = nib − 8 convention;
    # a nonzero zero_point would need an extra correction term.
    if w.zero_point_domain not in (
        ZeroPointDomain.NONE, ZeroPointDomain.INT
    ):
        return None
    if w.zero_point is not None:
        return None
    if w.quant_min != -8 or w.quant_max != 7:
        return None
    return functools.partial(_w4a8_impl, group_size=group_size, N=N, K=K)


def _w4a8_impl(x_q, x_scale, w, out_dtype, *, group_size, N, K):
    x2 = x_q.reshape(-1, K)
    out = w4a8_dq_matmul(
        x2, x_scale.reshape(-1), w.qdata, w.scale,
        group_size=group_size, out_dtype=out_dtype,
    )
    return out.reshape(x_q.shape[:-1] + (N,))
