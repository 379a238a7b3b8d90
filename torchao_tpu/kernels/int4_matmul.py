"""Fused int4 dequant-matmul Pallas kernel.

TPU replacement for the reference's tinygemm path
(``aten._weight_int4pack_mm``,
``csrc/cuda/tensor_core_tiled_layout/tensor_core_tiled_layout.cu``) and the
Marlin/HQQ/gemlite int4 GPU kernels (SURVEY.md §2.7).

Layout (tpu-first, not a translation of tinygemm's tensor-core tiles):

- **K-major packed weights**: ``wp[kp, n]`` (uint8) holds element
  ``w[n, kp]`` in the low nibble and ``w[n, kp + K/2]`` in the high nibble
  (half-split along K, see ``qtypes/packing.py``). The contraction dim
  lives on *sublanes*, output features on *lanes* — the natural MXU
  orientation, so the dequantized tile feeds ``jnp.dot`` with no
  transpose.
- **K-major group scales**: ``scale[K/g, N]`` — a ``(bkp/g, bn)`` block
  satisfies Mosaic's (8, 128) block-alignment rule, and the per-group
  expansion is a *sublane* repeat (cheap) instead of a lane shuffle.
- the half-split packing means a packed K-block maps to two contiguous
  activation column-blocks; the kernel reads ``x`` twice with different
  index maps (x_lo / x_hi) — no interleave anywhere.
- f32 VMEM accumulator over the K grid axis; tinygemm FLOAT-zero-domain
  dequant ``dq = (q − mid)·s + z`` on the VPU.

``int4_dq_matmul_reference`` is the jnp oracle used by tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.qtypes.base import PackingFormat
from torchao_tpu.quantization.quant_primitives import ZeroPointDomain
from torchao_tpu.utils import cdiv


def _kernel_v2(
    x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, z_lo_ref, z_hi_ref,
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int, mid: float,
    xored: bool = False,
):
    """Scale-on-partials variant: per-group bf16 sub-matmuls with the
    scale applied to [bm, bn] f32 partials and the zero term as a
    rank-1 rowsum update — removes the per-element q·s multiply and
    the jnp.repeat scale expansion from the VPU (only the nibble
    unpack casts remain per element)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_size
    bkp = wp_ref.shape[0]
    n_groups = bkp // g

    wp = wp_ref[:]
    if xored:
        wp = wp ^ jnp.uint8(0x80)
    lo = (wp & jnp.uint8(0xF)).astype(jnp.int8).astype(jnp.bfloat16)
    w_f = wp.astype(jnp.int16).astype(jnp.bfloat16)
    hi = (w_f - lo) * jnp.bfloat16(0.0625)

    def half(x_ref, q, s_ref, z2_ref):
        x = x_ref[:]
        s = s_ref[:].astype(jnp.float32)      # [n_groups, bn]
        z2 = z2_ref[:].astype(jnp.bfloat16)   # [n_groups, bn]
        ones = jnp.ones((g, 1), jnp.bfloat16)
        for gi in range(n_groups):
            xg = x[:, gi * g:(gi + 1) * g]
            p = jnp.dot(
                xg, q[gi * g:(gi + 1) * g, :],
                preferred_element_type=jnp.float32,
            )
            rs = jnp.dot(
                xg, ones, preferred_element_type=jnp.float32
            )                                  # [bm, 1] = Σ x_g
            acc_ref[:] += p * s[gi:gi + 1, :]
            acc_ref[:] += rs * z2[gi:gi + 1, :].astype(jnp.float32)

    half(x_lo_ref, lo, s_lo_ref, z_lo_ref)
    half(x_hi_ref, hi, s_hi_ref, z_hi_ref)

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_bint8(
    l_ref,      # scalar prefetch: [1] int32 layer index (0 if unstacked)
    x3_ref,     # [2nG, bm, g] bf16 — FULL grouped x (tiny at decode M;
                # one resident block instead of two k-indexed DMA
                # streams; the kernel slices its lo/hi groups in VMEM)
    wp_ref,     # [1, bkp, bn] uint8 — one layer's block of [L, Kp, N]
    slo_ref,    # [1, bg, bn] bf16 — s_lo family block (one qparams_eff
    shi16_ref,  # [1, bg, bn] bf16 — s_hi/16      array, four family-
    z2lo_ref,   # [1, bg, bn] bf16 — z − mid·s    offset index maps —
    z2hi_ref,   # [1, bg, bn] bf16 — z+(8−mid)·s  see _bint8_call)
    out_ref, acc_ref, *, n_k_blocks: int, xored: bool = False,
):
    """Batched-int8 variant: zero float casts on the weight path.

    Probed on hw: batched ``dot_general`` with a bf16 lhs and s8 rhs is
    native and exact on the MXU. The nibble unpack is two integer VPU
    ops per byte —

      ``lo = (w & 0xF)``  (int8, the low nibble)
      ``b′ = (w ^ 0x80)`` bitcast int8 ``= lo + 16·hi_s``  with
      ``hi_s = hi − 8`` the sign-interpreted high nibble (flipping the
      top bit re-biases the high nibble to two's complement)

    so per-group f32 partials give the exact dequant-matmul via
      ``out = Σ_g [x_lo@lo]·s_lo + ([x_hi@b′] − [x_hi@lo])·(s_hi/16)
              + rowsum terms``
    with all scale math on [bg, bm, bn] partials instead of per weight
    element. Wins for small M (decode GEMV); per-partial cost grows
    with bm, so large-M callers use the fused variant.

    Weight-side operands carry a leading layer axis indexed by the
    scalar-prefetched ``l_ref`` via the BlockSpec index maps, so a
    stacked [L, Kp, N] weight inside ``lax.scan`` feeds the kernel with
    NO per-layer slice materialization — XLA cannot fuse a
    dynamic-slice into a custom call, so slicing first would copy every
    weight once per decode step (profiled: ~40% of the decode step)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, bkp, bn = wp_ref.shape
    two_ng, bm, g = x3_ref.shape
    nG = two_ng // 2
    bg = bkp // g

    w = wp_ref[0]
    lo3 = (w & jnp.uint8(0xF)).astype(jnp.int8).reshape(bg, g, bn)
    # pre-XORed storage (IntxArray.nibbles_xored): b' is the raw byte
    b3 = (w if xored else (w ^ jnp.uint8(0x80))).astype(
        jnp.int8
    ).reshape(bg, g, bn)

    xlo = x3_ref[pl.ds(k * bg, bg)]
    xhi = x3_ref[pl.ds(nG + k * bg, bg)]
    xcat = jnp.concatenate([xlo, xhi], axis=1)         # [bg, 2bm, g]

    plo = jax.lax.dot_general(
        xcat, lo3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [bg, 2bm, bn]
    pb = jax.lax.dot_general(
        xhi, b3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [bg, bm, bn]
    contrib = (
        plo[:, :bm, :] * slo_ref[0].astype(jnp.float32)[:, None, :]
        + (pb - plo[:, bm:, :])
        * shi16_ref[0].astype(jnp.float32)[:, None, :]
    )
    acc_ref[:] += jnp.sum(contrib, axis=0)

    # zero terms: Σ_k x[k]·z′[k//g, n] = rowsumsᵀ @ z′ (one MXU dot each)
    rs_lo = jnp.sum(xlo, axis=2)                        # [bg, bm]
    rs_hi = jnp.sum(xhi, axis=2)
    acc_ref[:] += jax.lax.dot_general(
        rs_lo, z2lo_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        rs_hi, z2hi_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_bint8m(
    l_ref,      # scalar prefetch: [1] int32 layer index
    x3_ref,     # [2nG, bm, g] bf16 — full grouped x (resident)
    wp_ref,     # [1, bkp, bn] uint8
    qp_ref,     # [1, 4·bg, bn] bf16 — ONE merged block-major qparams
                # block: chunks of 4·cb rows [s_lo|s_hi/16|z2lo|z2hi]
    out_ref, acc_ref, *, n_k_blocks: int, n_chunks: int,
    xored: bool = False, stub: bool = False,
):
    """Merged-DMA variant of ``_kernel_bint8``: identical math, but the
    four qparam families arrive in ONE block-major stream (see
    ``qtypes.intx._tiled_eff_qparams`` chunked layout) — 2 DMA streams
    per grid step (weights + qparams) instead of 5. The body processes
    the K block in ``n_chunks`` canonical chunks so the stored layout
    is independent of the launch-time ``bkp``.

    ``stub=True`` is the CEILING PROBE (VERDICT r3 #1): identical
    BlockSpecs/operands/launch structure, but the dequant is stubbed to
    one raw-byte MXU pass — no nibble unpack, no qparam math — so the
    measured rate is the platform's streaming ceiling for this exact
    launch structure. Results are NOT the matmul."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, bkp, bn = wp_ref.shape
    two_ng, bm, g = x3_ref.shape
    nG = two_ng // 2
    bg = bkp // g
    cg = bg // n_chunks          # groups per canonical chunk
    ck = cg * g                  # packed rows per chunk

    if stub:
        # one bf16×s8 batched dot over the raw bytes per chunk; qparams
        # block touched with a single-row read (the DMA streams whole
        # blocks regardless of how much the body reads)
        for c in range(n_chunks):
            wc = wp_ref[0, pl.ds(c * ck, ck)].astype(jnp.int8)
            xlo = x3_ref[pl.ds(k * bg + c * cg, cg)]
            p = jax.lax.dot_general(
                xlo, wc.reshape(cg, g, bn), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] += jnp.sum(p, axis=0)
        acc_ref[:] += qp_ref[0, :bm].astype(jnp.float32) * 1e-30

        @pl.when(k == n_k_blocks - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

        return

    # M-tiling (round 4, serving-knee fix): bm > 16 would blow the
    # [cg, 2bm, bn] f32 partials past VMEM, so m-tiles of ≤16 rows
    # REUSE each streamed weight block — B=32 serving decode stays in
    # the GEMV kernel class (one weight read per step) instead of
    # falling to the fused prefill variant.
    mt = bm if bm <= 16 else 16
    n_mt = bm // mt

    for c in range(n_chunks):
        wc = wp_ref[0, pl.ds(c * ck, ck)]
        lo3 = (wc & jnp.uint8(0xF)).astype(jnp.int8).reshape(cg, g, bn)
        b3 = (wc if xored else (wc ^ jnp.uint8(0x80))).astype(
            jnp.int8
        ).reshape(cg, g, bn)

        base = k * bg + c * cg
        qoff = c * 4 * cg
        slo = qp_ref[0, pl.ds(qoff, cg)].astype(jnp.float32)
        shi16 = qp_ref[0, pl.ds(qoff + cg, cg)].astype(jnp.float32)
        z2lo = qp_ref[0, pl.ds(qoff + 2 * cg, cg)]
        z2hi = qp_ref[0, pl.ds(qoff + 3 * cg, cg)]

        for m in range(n_mt):
            xlo = x3_ref[pl.ds(base, cg), pl.ds(m * mt, mt)]
            xhi = x3_ref[pl.ds(nG + base, cg), pl.ds(m * mt, mt)]
            xcat = jnp.concatenate([xlo, xhi], axis=1)   # [cg, 2mt, g]

            plo = jax.lax.dot_general(
                xcat, lo3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                             # [cg, 2mt, bn]
            pb = jax.lax.dot_general(
                xhi, b3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                             # [cg, mt, bn]
            contrib = (
                plo[:, :mt, :] * slo[:, None, :]
                + (pb - plo[:, mt:, :]) * shi16[:, None, :]
            )
            acc_ref[pl.ds(m * mt, mt)] += jnp.sum(contrib, axis=0)
            rs_lo = jnp.sum(xlo, axis=2)                  # [cg, mt]
            rs_hi = jnp.sum(xhi, axis=2)
            acc_ref[pl.ds(m * mt, mt)] += jax.lax.dot_general(
                rs_lo, z2lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[pl.ds(m * mt, mt)] += jax.lax.dot_general(
                rs_hi, z2hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def eff_qparams_to_block_major(qeff: jnp.ndarray, chunk_groups: int):
    """Reorder family-major kernel-form qparams ``[.., 4·nG, N]`` into
    the chunked block-major layout the merged kernel consumes: for each
    canonical chunk of ``cb`` groups, its four family row-slabs are
    contiguous ([s_lo | s_hi/16 | z2lo | z2hi] per chunk)."""
    *lead, fourng, N = qeff.shape
    nG = fourng // 4
    cb = chunk_groups
    assert nG % cb == 0, (nG, cb)
    nchunk = nG // cb
    q = qeff.reshape(*lead, 4, nchunk, cb, N)
    q = jnp.moveaxis(q, -4, -3)              # [.., nchunk, 4, cb, N]
    return q.reshape(*lead, fourng, N)


def _kernel_banded_stacked(
    l_ref,      # scalar prefetch: [1] int32 layer index
    x_lo_ref,   # [bm, bkp] bf16 — lo-half activation columns (k-indexed)
    x_hi_ref,   # [bm, bkp] — hi-half activation columns
    wp_ref,     # [1, bkp, bn] uint8 — one layer's block of [L, Kp, N]
    qp_ref,     # [1, 4·bg, bn] bf16 — chunked block-major qparams
                # ([s_lo|s_hi/16|z2lo|z2hi] per canonical chunk)
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int,
    n_chunks: int, xored: bool = False,
):
    """Stacked-weight banded variant: the fat-dot math of
    ``_kernel_banded`` with scalar-prefetch layer indexing and the
    merged block-major qparams stream (same operand layout as
    ``_kernel_bint8m``), so it is a drop-in alternative for the decode
    scan. Unlike the batched variant it takes PLAIN [bm, K]-row
    activations — no grouped-x3 fold — which makes it the natural body
    for multi-matmul megakernels (the transition between two chained
    projections is elementwise only)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, bkp, bn = wp_ref.shape
    bm = x_lo_ref.shape[0]
    g = group_size
    bg = bkp // g
    cb = bg // n_chunks

    w = wp_ref[0]
    lo = (w & jnp.uint8(0xF)).astype(jnp.int8)            # [bkp, bn]
    bp = (w if xored else (w ^ jnp.uint8(0x80))).astype(jnp.int8)

    diff = (
        jax.lax.broadcasted_iota(jnp.int32, (bg, bkp), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (bg, bkp), 1) // g
    )
    maskf = (1 - jnp.minimum(diff * diff, 1)).astype(jnp.bfloat16)

    def banded(x):  # [bm, bkp] → [bm·bg, bkp] bf16, row m·bg + gi
        xb = x.astype(jnp.bfloat16)
        blocks = [maskf * xb[m:m + 1] for m in range(bm)]
        return blocks[0] if bm == 1 else jnp.concatenate(blocks, axis=0)

    a_lo = banded(x_lo_ref[:])
    a_hi = banded(x_hi_ref[:])
    p_lo2 = jax.lax.dot_general(
        jnp.concatenate([a_lo, a_hi], axis=0), lo,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(2 * bm, bg, bn)
    p_b = jax.lax.dot_general(
        a_hi, bp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bm, bg, bn)

    # chunked qparams: family rows live per chunk of cb groups
    qp = qp_ref[0]
    fam = []
    for f in range(4):  # slo | shi16 | z2lo | z2hi, [bg, bn] each
        rows = [
            qp[c * 4 * cb + f * cb:(c * 4 + f + 1) * cb]
            for c in range(n_chunks)
        ]
        fam.append(
            rows[0] if n_chunks == 1
            else jnp.concatenate(rows, axis=0)
        )
    slo, shi16, z2lo, z2hi = fam

    contrib = (
        p_lo2[:bm] * slo.astype(jnp.float32)[None]
        + (p_b - p_lo2[bm:]) * shi16.astype(jnp.float32)[None]
    )
    acc_ref[:] += jnp.sum(contrib, axis=1)

    diffE = (
        jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 0) // g
        - jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 1)
    )
    E = (1 - jnp.minimum(diffE * diffE, 1)).astype(jnp.bfloat16)
    for x_ref, z2 in ((x_lo_ref, z2lo), (x_hi_ref, z2hi)):
        t = jnp.dot(
            x_ref[:].astype(jnp.bfloat16), E,
            preferred_element_type=jnp.float32,
        )                                                  # [bm, bg]
        acc_ref[:] += jnp.dot(
            t.astype(jnp.bfloat16), z2.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_banded(
    x_lo_ref,   # [bm, bkp] bf16/f32 — lo-half activation columns
    x_hi_ref,   # [bm, bkp] — hi-half activation columns
    wp_ref,     # [bkp, bn] uint8
    slo_ref,    # [bg, bn] — lo-half group scales
    shi16_ref,  # [bg, bn] — hi-half group scales / 16
    z2lo_ref,   # [bg, bn] bf16 — z − mid·s (lo)
    z2hi_ref,   # [bg, bn] bf16 — z + (8 − mid)·s (hi)
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int,
    xored: bool = False,
):
    """Banded fat-dot variant: ONE wide MXU contraction per half.

    The batched-int8 variant issues ``bg`` batched sub-dots with K = g
    (32) contraction depth — far below the 128-deep MXU pipeline, so the
    kernel is dot-issue-bound at ~320 GB/s effective while plain int8
    streaming reaches 600+ GB/s. FLOPs here are free (200 TFLOP/s
    measured vs a memory-bound workload), so trade them for issue rate:
    build a *banded* activation matrix in VMEM,

      ``A[m·bg + gi, k] = x[m, k] · [k // g == gi]``   ([bm·bg, bkp])

    and compute ALL per-group partials in one K = bkp contraction,
    ``P = A @ W`` → ``P[m·bg + gi, n] = Σ_{k∈gi} x[m,k]·w[k,n]``. The
    31/32 zero multiplies cost nothing on a memory-bound kernel. The hi
    half needs only ONE extra dot via the nibble-difference identity

      ``d = (w ^ 0x80)·as_i8 − (w & 0xF)·as_i8 = 16·(hi − 8)``  (int8,
      exact: 16·hi_s ∈ [−128, 112], no wrap)

    so ``A_hi @ d`` is directly the hi-half group partial scaled ×16,
    matching the precomputed ``s_hi/16``. Zero terms ride two tiny
    group-indicator dots exactly as in the fused variant."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bkp, bn = wp_ref.shape
    bm = x_lo_ref.shape[0]
    bg = slo_ref.shape[0]
    g = group_size

    w = wp_ref[:]
    lo = (w & jnp.uint8(0xF)).astype(jnp.int8)            # [bkp, bn]
    bp = (w if xored else (w ^ jnp.uint8(0x80))).astype(
        jnp.int8
    )                                                     # lo + 16·(hi−8)
    # NOTE: int8 `bp - lo` is NOT Mosaic-legal (arith.subi on i8 fails
    # to legalize, probed on hw) — subtract the f32 partials instead,
    # exactly as the batched_int8 variant does.

    # 0/1 band indicator built arithmetically in i32 → bf16 multiply:
    # an [bg, bkp] i1 compare here trips a Mosaic "invalid relayout"
    # (vector<32x1024xi1>, probed on hw), so avoid i1 vectors entirely.
    diff = (
        jax.lax.broadcasted_iota(jnp.int32, (bg, bkp), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (bg, bkp), 1) // g
    )
    maskf = (1 - jnp.minimum(diff * diff, 1)).astype(jnp.bfloat16)

    def banded(x):  # [bm, bkp] → [bm·bg, bkp] bf16, row m·bg + gi
        xb = x.astype(jnp.bfloat16)
        blocks = [maskf * xb[m:m + 1] for m in range(bm)]
        return blocks[0] if bm == 1 else jnp.concatenate(blocks, axis=0)

    a_lo = banded(x_lo_ref[:])
    a_hi = banded(x_hi_ref[:])
    # one fat K=bkp dot for both halves against `lo`
    p_lo2 = jax.lax.dot_general(
        jnp.concatenate([a_lo, a_hi], axis=0), lo,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(2 * bm, bg, bn)
    p_b = jax.lax.dot_general(
        a_hi, bp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bm, bg, bn)

    contrib = (
        p_lo2[:bm] * slo_ref[:].astype(jnp.float32)[None]
        + (p_b - p_lo2[bm:])
        * shi16_ref[:].astype(jnp.float32)[None]
    )
    acc_ref[:] += jnp.sum(contrib, axis=1)

    # zero terms: Σ_k x[k]·z′[k//g, n] = (x @ E) @ z′, E the [bkp, bg]
    # group-indicator — two tiny MXU dot pairs (as in the fused variant)
    diffE = (
        jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 0) // g
        - jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 1)
    )
    E = (1 - jnp.minimum(diffE * diffE, 1)).astype(jnp.bfloat16)
    for x_ref, z2_ref in ((x_lo_ref, z2lo_ref), (x_hi_ref, z2hi_ref)):
        t = jnp.dot(
            x_ref[:].astype(jnp.bfloat16), E,
            preferred_element_type=jnp.float32,
        )                                                  # [bm, bg]
        acc_ref[:] += jnp.dot(
            t.astype(jnp.bfloat16), z2_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel(
    x_lo_ref, x_hi_ref, wp_ref, s_lo_ref, s_hi_ref, z_lo_ref, z_hi_ref,
    out_ref, acc_ref, *, group_size: int, n_k_blocks: int, mid: float,
    xored: bool = False,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # VPU-minimized dequant: dq = (q − mid)·s + z = q·s + z′ with
    # z′ = z − mid·s precomputed by the wrapper, and the Σ_k x_k·z′[k//g,n]
    # term moved to the MXU via per-group activation sums (t = x @ E with
    # E the group-indicator matrix) — per weight element only unpack,
    # convert and one multiply remain on the VPU.
    bkp = wp_ref.shape[0]
    bg = s_lo_ref.shape[0]
    # Nibble unpack without i32 widening (4× lane density) and without
    # shifts (Mosaic legalizes shifts only at i32; u8→bf16 casts don't
    # exist, but u8→i8 and i16→bf16 do):
    #   lo = w & 0xF              (u8 AND, then i8→bf16 cast)
    #   hi = (w − lo) · 2⁻⁴       (two bf16 VPU ops — exact: integers
    #                              ≤255 and multiples of 16 are exact
    #                              in bf16's 8-bit mantissa)
    wp = wp_ref[:]
    if xored:
        wp = wp ^ jnp.uint8(0x80)
    lo = (wp & jnp.uint8(0xF)).astype(jnp.int8).astype(jnp.bfloat16)
    w_f = wp.astype(jnp.int16).astype(jnp.bfloat16)
    hi = (w_f - lo) * jnp.bfloat16(0.0625)

    row = jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 1)
    E = (row // group_size == col).astype(jnp.bfloat16)

    def half(x_ref, q, s_ref, z2_ref):
        s = jnp.repeat(s_ref[:], group_size, axis=0)
        x = x_ref[:]
        acc_ref[:] += jnp.dot(
            x, q * s, preferred_element_type=jnp.float32
        )
        t = jnp.dot(x, E, preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(
            t.astype(jnp.bfloat16), z2_ref[:],
            preferred_element_type=jnp.float32,
        )

    half(x_lo_ref, lo, s_lo_ref, z_lo_ref)
    half(x_hi_ref, hi, s_hi_ref, z_hi_ref)

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "mid", "bm", "bn", "bkp", "interpret", "variant",
        "qparams_chunk", "xored", "stub",
    ),
)
def int4_dq_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32
    wp: jnp.ndarray,       # [K/2, N] uint8, K-major half-split nibbles
    scale: jnp.ndarray,    # [K/g, N]
    zero: jnp.ndarray,     # [K/g, N] (FLOAT zero-point domain)
    qparams_eff: Optional[jnp.ndarray] = None,  # [4·K/(2g), N] bf16 —
    #   interleaved kernel-form qparams (qtypes.intx._tiled_eff_qparams)
    *,
    group_size: int,
    mid: float = 8.0,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    bkp: Optional[int] = None,
    interpret: bool = False,
    variant: str = "auto",
    layer_idx=None,
    qparams_chunk: Optional[int] = None,  # groups per chunk when
    #   qparams_eff is in the chunked BLOCK-MAJOR layout (merged-DMA
    #   decode kernel); None = family-major
    xored: bool = False,  # qdata bytes pre-XORed with 0x80
    stub: bool = False,   # CEILING PROBE: stream-only body (wrong math)
) -> jnp.ndarray:
    """out[m, n] = Σ_k x[m, k] · ((q[n, k] − mid)·s[k//g, n] + z[k//g, n]).

    ``layer_idx`` (traced int32): all weight-side operands carry a
    leading stacked-layer axis; the batched_int8 variant indexes it
    inside the kernel via scalar prefetch (zero-copy under ``lax.scan``
    — see ``_bint8_call``); other variants fall back to an XLA slice.
    """
    M, K = x.shape
    if layer_idx is not None:
        _, Kp, N = wp.shape
    else:
        Kp, N = wp.shape
    assert Kp * 2 == K, (K, Kp)
    g_eff = min(group_size, Kp)
    assert Kp % g_eff == 0, (Kp, g_eff)

    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    # bkp must divide Kp (whole-block offsets for the hi half), be a
    # multiple of group_size, and — in compiled mode — give scale blocks
    # with ≥8 sublane rows: Mosaic requires block rows divisible by 8
    # (or equal to the full array, impossible here since lo/hi each read
    # half the rows), so the compiled kernel needs 8·g | Kp (the
    # dispatch gate enforces this; interpret mode has no such rule).
    row_mult = 1 if interpret else 8
    assert g_eff <= Kp and Kp % (row_mult * g_eff) == 0, (Kp, g_eff)
    if bkp is None:
        # group_partial statically unrolls bkp/g sub-matmuls per body —
        # keep the unroll at the 8-group Mosaic minimum; the fused
        # variant prefers the swept 1024 (PERF.md block sweep)
        bkp = 8 * g_eff if variant == "group_partial" else 1024
    bkp = min(bkp, Kp)
    bkp = math.gcd(bkp, Kp)
    if bkp % (row_mult * g_eff) != 0:
        bkp = row_mult * g_eff  # divides Kp by the assert above
    bg = bkp // g_eff
    assert bg % row_mult == 0 and Kp % bkp == 0, (bg, Kp, bkp)

    # decode-shaped M defaults to the batched-int8 variant: measured
    # 59.1 vs 42.3 tok/s on the 8B int4wo-g32 headline (1.40×, 277 GB/s
    # effective). [bg, 3·bm, bn] f32 partials live in VMEM, so it is a
    # small-M (GEMV) design; the CHUNKED kernel additionally m-tiles up
    # to M=64 (round-4 serving-knee fix: B=32 decode reuses each
    # streamed weight block across 8-row tiles instead of exiting to
    # the fused prefill variant); larger M uses the fused variant.
    # M ≤ 32 measured: 32-slot serving 1049 → 1133 tok/s; M = 64 blows
    # the 16 MB scoped-VMEM limit on the 128k-vocab head (17.07M) —
    # larger batches use the fused variant
    bint8_max_m = 32 if (
        qparams_chunk is not None and M % 16 == 0
    ) else 16
    if variant == "auto":
        variant = "batched_int8" if M <= bint8_max_m else "fused"
    elif variant in ("batched_int8", "banded") and M > bint8_max_m:
        # can't honor: [bg·bm, ·] operands/partials exceed VMEM at this M
        import warnings

        warnings.warn(
            f"variant={variant!r} requires M <= {bint8_max_m} (got "
            f"M={M}); running the fused variant instead"
        )
        variant = "fused"
    if bn is None:
        # bench-swept: 61.23 tok/s @ bn=2048 vs 59.06 @ 1024 (8B
        # headline, M=1); M>8 keeps 1024 (3·bm·bg·bn f32 partials)
        bn = (
            2048 if (variant == "batched_int8" and M <= 8) else 1024
        )
    bn = min(bn, N)
    if bm is None:
        bm = 8 if M <= 8 else min(256, M)
    bm = min(bm, M) if (M % 8 == 0 or M < 8) else 8

    nbk = Kp // bkp
    grid = (cdiv(M, bm), cdiv(N, bn), nbk)

    if variant == "batched_int8" and M <= bint8_max_m:
        return _bint8_call(
            x, wp, scale, zero, qparams_eff,
            group_size=g_eff, mid=mid, bm=M, bn=bn, bkp=bkp,
            interpret=interpret, layer_idx=layer_idx,
            qparams_chunk=qparams_chunk, xored=xored, stub=stub,
        )
    if (
        variant == "banded" and M <= 16
        and qparams_chunk is not None
    ):
        # stacked banded fast path (chunked qparams, zero-copy layers)
        return _banded_stacked_call(
            x, wp, qparams_eff,
            group_size=g_eff, bm=M, bn=bn, bkp=bkp,
            interpret=interpret, layer_idx=layer_idx,
            qparams_chunk=qparams_chunk, xored=xored,
        )
    if qparams_chunk is not None:
        # non-decode variants assume FAMILY-major qparams_eff; let them
        # derive their forms from scale/zero instead
        qparams_eff = None
    if layer_idx is not None:
        # non-bint8 variants: materialize the layer slice (XLA copy).
        # NOTE a scalar-prefetch stacked variant of the fused prefill
        # kernel was built and measured e2e in round 3: serving
        # full-workload 710.5 vs 775.5 tok/s — the per-pass slice
        # copies overlap better with prefill compute than the
        # prefetch-indexed stream does; reverted.
        wp = wp[layer_idx]
        scale = scale[layer_idx]
        zero = zero[layer_idx] if zero is not None else None
        qparams_eff = (
            qparams_eff[layer_idx] if qparams_eff is not None else None
        )
    if variant == "banded" and M <= 16:
        return _banded_call(
            x, wp, scale, zero, qparams_eff,
            group_size=g_eff, mid=mid, bm=M, bn=bn, bkp=bkp,
            interpret=interpret, xored=xored,
        )

    kfn = _kernel_v2 if variant == "group_partial" else _kernel
    kernel = functools.partial(
        kfn, group_size=g_eff, n_k_blocks=nbk, mid=mid, xored=xored
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
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k + nbk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * N * K,
            bytes_accessed=Kp * N + scale.size * 4 + M * K * 4,
            transcendentals=0,
        ),
    )
    s_b = scale.astype(jnp.bfloat16)
    # pre-biased zeros: z′ = z − mid·s (see kernel docstring)
    z2 = (
        zero.astype(jnp.float32) - mid * scale.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    out = out(x, x, wp, s_b, s_b, z2, z2)
    return out


def _pipeline_experiment_knobs():
    """Per-grid-step streaming experiment knobs (round-3 DMA work):
    ``TORCHAO_TPU_INT4_BUFFERS=n`` multiple-buffers the weight-side
    streams n-deep (default Mosaic double-buffering),
    ``TORCHAO_TPU_INT4_LOOKAHEAD=1`` lets the pipeline fetch the next
    *changed* block as soon as a slot frees (pl.Buffered.use_lookahead),
    ``TORCHAO_TPU_INT4_VMEM_MB=m`` raises the Mosaic scoped-VMEM limit."""
    import os

    bufs = os.environ.get("TORCHAO_TPU_INT4_BUFFERS")
    look = os.environ.get("TORCHAO_TPU_INT4_LOOKAHEAD") == "1"
    pipeline_mode = (
        pl.Buffered(buffer_count=int(bufs), use_lookahead=look)
        if bufs
        else (pl.Buffered(buffer_count=2, use_lookahead=True) if look
              else None)
    )
    vmem = os.environ.get("TORCHAO_TPU_INT4_VMEM_MB")
    vmem_bytes = int(float(vmem) * 2**20) if vmem else None
    return pipeline_mode, vmem_bytes


def _bint8_call(
    x, wp, scale, zero, qparams_eff=None,
    *, group_size, mid, bm, bn, bkp, interpret, layer_idx=None,
    qparams_chunk=None, xored=False, stub=False,
):
    """Launch the batched-int8 variant (see ``_kernel_bint8``).

    ``layer_idx`` (traced int32 scalar) selects one layer of STACKED
    weight-side operands (``wp`` [L, Kp, N], qparams [L, 4·nG, N]) via
    scalar-prefetch index maps — no per-layer slice materialization
    inside ``lax.scan``. Unstacked operands are viewed as L = 1."""
    M, K = x.shape
    if layer_idx is None:
        wp = wp[None]
        scale = scale[None] if scale is not None else None
        zero = zero[None] if zero is not None else None
        qparams_eff = (
            qparams_eff[None] if qparams_eff is not None else None
        )
        layer_idx = 0
    _, Kp, N = wp.shape
    g = group_size
    nG = Kp // g            # groups per packed half
    bg = bkp // g
    nbk = Kp // bkp

    # decode-shaped M only: one block holds all rows; partials stay
    # under VMEM via bm ≤ 16 directly or (chunked kernel) 8-row m-tiles
    # up to M = 64
    assert bm == M and (
        M <= 16 or (qparams_chunk is not None and M <= 32 and M % 16 == 0)
    ), (M, bm, qparams_chunk)

    x3 = x.reshape(M, 2 * nG, g).transpose(1, 0, 2)     # [2nG, M, g]
    if qparams_eff is None:
        # derive the interleaved kernel-form qparams per call (tests /
        # direct callers; quantize_ precomputes them as a weight leaf —
        # same row layout as qtypes.intx._tiled_eff_qparams)
        s = scale.astype(jnp.float32)
        z = (
            jnp.zeros_like(s) if zero is None
            else zero.astype(jnp.float32)
        )
        s_lo, s_hi = s[..., :nG, :], s[..., nG:, :]
        z_lo, z_hi = z[..., :nG, :], z[..., nG:, :]
        qparams_eff = jnp.concatenate(
            [
                s_lo,
                s_hi / 16.0,
                z_lo - mid * s_lo,
                z_hi + (8.0 - mid) * s_hi,
            ],
            axis=-2,
        ).astype(jnp.bfloat16)
        if qparams_chunk is not None:
            # callers with a chunk pass qparams_eff already block-major;
            # on-the-fly derivation starts family-major — reorder here
            qparams_eff = eff_qparams_to_block_major(
                qparams_eff, qparams_chunk
            )

    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))

    if qparams_chunk is not None:
        # merged-DMA kernel: ONE block-major qparams stream/step
        cb = qparams_chunk
        ckp = cb * g                      # packed rows per chunk
        if bkp % ckp != 0 or nG % cb != 0:
            bkp = ckp
            bg = bkp // g
            nbk = Kp // bkp
        assert Kp % bkp == 0 and bkp % ckp == 0, (Kp, bkp, ckp)
        if qparams_eff.shape[-2] != 4 * nG:
            raise ValueError(
                f"qparams_eff rows {qparams_eff.shape[-2]} != 4·nG"
            )
        grid = (cdiv(M, bm), cdiv(N, bn), nbk)
        kernel = functools.partial(
            _kernel_bint8m, n_k_blocks=nbk, n_chunks=bg // cb,
            xored=xored, stub=stub,
        )
        pmode, vmem_bytes = _pipeline_experiment_knobs()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (2 * nG, bm, g), lambda i, j, k, l: (0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, bkp, bn), lambda i, j, k, l: (l[0], k, j),
                    pipeline_mode=pmode,
                ),
                pl.BlockSpec(
                    (1, 4 * bg, bn), lambda i, j, k, l: (l[0], k, j),
                    pipeline_mode=pmode,
                ),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=vmem_bytes,
            ),
            cost_estimate=pl.CostEstimate(
                flops=6 * M * N * K,
                bytes_accessed=Kp * N
                + (scale.size * 4 if scale is not None
                   else qparams_eff.size * 2) // max(wp.shape[0], 1)
                + M * K * 4,
                transcendentals=0,
            ),
        )(lvec, x3, wp, qparams_eff)
        return out

    assert not stub, "stub (ceiling probe) requires chunked qparams_eff"
    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(_kernel_bint8, n_k_blocks=nbk, xored=xored)
    pmode, vmem_bytes = _pipeline_experiment_knobs()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2 * nG, bm, g), lambda i, j, k, l: (0, 0, 0)
            ),
            pl.BlockSpec((1, bkp, bn), lambda i, j, k, l: (l[0], k, j),
                         pipeline_mode=pmode),
            pl.BlockSpec((1, bg, bn), lambda i, j, k, l: (l[0], k, j),
                         pipeline_mode=pmode),
            pl.BlockSpec(
                (1, bg, bn), lambda i, j, k, l: (l[0], k + nbk, j),
                pipeline_mode=pmode,
            ),
            pl.BlockSpec(
                (1, bg, bn), lambda i, j, k, l: (l[0], k + 2 * nbk, j),
                pipeline_mode=pmode,
            ),
            pl.BlockSpec(
                (1, bg, bn), lambda i, j, k, l: (l[0], k + 3 * nbk, j),
                pipeline_mode=pmode,
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # i/j tiles are independent; only the K axis carries the
            # accumulator — lets Mosaic pipeline/reorder the N tiles
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * N * K,
            bytes_accessed=Kp * N + scale.size * 4 // max(wp.shape[0], 1)
            + M * K * 4,
            transcendentals=0,
        ),
    )(
        lvec, x3, wp,
        qparams_eff, qparams_eff, qparams_eff, qparams_eff,
    )
    return out


def _banded_stacked_call(
    x, wp, qparams_eff,
    *, group_size, bm, bn, bkp, interpret, layer_idx=None,
    qparams_chunk, xored=False,
):
    """Launch the stacked banded variant (see ``_kernel_banded_stacked``):
    scalar-prefetch layer indexing + ONE chunked block-major qparams
    stream — the same operand layout the decode scan already stores, but
    with the fat-dot math (a handful of MXU issues per grid step instead
    of ~2·bg batched sub-dots)."""
    M, K = x.shape
    if layer_idx is None:
        wp = wp[None]
        qparams_eff = qparams_eff[None]
        layer_idx = 0
    _, Kp, N = wp.shape
    g = group_size
    cb = qparams_chunk
    ckp = cb * g                      # packed rows per canonical chunk
    if bkp % ckp != 0:
        bkp = ckp
    bkp = min(bkp, Kp)
    assert Kp % bkp == 0 and bkp % ckp == 0, (Kp, bkp, ckp)
    bg = bkp // g
    nbk = Kp // bkp
    assert bm == M and M <= 16, (M, bm)

    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))
    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(
        _kernel_banded_stacked, group_size=g, n_k_blocks=nbk,
        n_chunks=bg // cb, xored=xored,
    )
    pmode, vmem_bytes = _pipeline_experiment_knobs()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkp), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((bm, bkp), lambda i, j, k, l: (i, k + nbk)),
            pl.BlockSpec(
                (1, bkp, bn), lambda i, j, k, l: (l[0], k, j),
                pipeline_mode=pmode,
            ),
            pl.BlockSpec(
                (1, 4 * bg, bn), lambda i, j, k, l: (l[0], k, j),
                pipeline_mode=pmode,
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K * (bkp // g),
            bytes_accessed=Kp * N + 4 * (Kp // g) * N * 2 + M * K * 4,
            transcendentals=0,
        ),
    )(lvec, x, x, wp, qparams_eff)
    return out


def _banded_call(
    x, wp, scale, zero, qparams_eff=None,
    *, group_size, mid, bm, bn, bkp, interpret, xored=False,
):
    """Launch the banded fat-dot variant (see ``_kernel_banded``)."""
    M, K = x.shape
    Kp, N = wp.shape
    g = group_size
    nG = Kp // g
    bg = bkp // g
    nbk = Kp // bkp

    assert bm == M and M <= 16, (M, bm)

    if qparams_eff is not None:
        s_lo, shi16, z2lo, z2hi = (
            qparams_eff[:nG], qparams_eff[nG:2 * nG],
            qparams_eff[2 * nG:3 * nG], qparams_eff[3 * nG:],
        )
    else:
        s_lo = scale[:nG].astype(jnp.float32)
        s_hi = scale[nG:].astype(jnp.float32)
        z_lo = zero[:nG].astype(jnp.float32)
        z_hi = zero[nG:].astype(jnp.float32)
        z2lo = (z_lo - mid * s_lo).astype(jnp.bfloat16)
        z2hi = (z_hi + (8.0 - mid) * s_hi).astype(jnp.bfloat16)
        shi16 = s_hi / 16.0

    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(
        _kernel_banded, group_size=g, n_k_blocks=nbk, xored=xored
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bkp), lambda i, j, k: (i, k + nbk)),
            pl.BlockSpec((bkp, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bg, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # the banded dots contract over the full bkp (bg× the
            # useful flops) — free on a memory-bound kernel, but tell
            # the scheduler the truth
            flops=2 * M * N * K * (bkp // g),
            bytes_accessed=Kp * N + scale.size * 4 + M * K * 4,
            transcendentals=0,
        ),
    )(x, x, wp, s_lo, shi16, z2lo, z2hi)
    return out


def int4_dq_matmul_reference(x, wp, scale, zero, *, group_size, mid=8.0,
                             xored=False):
    """jnp oracle with identical math (wp/scale/zero K-major)."""
    from torchao_tpu.qtypes.packing import unpack_int4

    if xored:
        wp = wp ^ jnp.uint8(0x80)
    q = unpack_int4(wp.T, axis=-1).astype(jnp.bfloat16)  # [N, K]
    s = jnp.repeat(scale.T.astype(jnp.bfloat16), group_size, axis=-1)
    z = jnp.repeat(zero.T.astype(jnp.bfloat16), group_size, axis=-1)
    dq = (q - mid) * s + z
    return jax.lax.dot_general(
        x, dq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# dispatch probe
# ---------------------------------------------------------------------------


def int4_dq_matmul_available(x, w, layer_idx=None):
    """Returns an impl callable when the Pallas kernel supports this case
    (TILED_NIBBLES K-major layout, aligned shapes, FLOAT zero domain)."""
    from torchao_tpu.qtypes.intx import IntxArray

    import os

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_INT4") == "1":
        return None
    if not isinstance(w, IntxArray):
        return None
    if w.packing_format is not PackingFormat.TILED_NIBBLES:
        return None
    # FLOAT zero-point domain (tinygemm), or symmetric with no zero
    # point (e.g. the 8da4w TILED weight: nib = q + 8, so
    # dq = (nib − 8)·s is the same tinygemm form with z = 0, mid = 8)
    symmetric = w.zero_point is None
    int_domain = (
        not symmetric and w.zero_point_domain is ZeroPointDomain.INT
    )
    if int_domain and w.qparams_eff is None:
        # INT zero domain (HQQ/gemlite int4) rides the same kernels via
        # the float-equivalent zero z = (mid − zp)·s — precomputed as
        # qparams_eff at quantize time; without it, fall back to XLA
        return None
    if (
        not symmetric
        and not int_domain
        and w.zero_point_domain is not ZeroPointDomain.FLOAT
    ):
        return None
    stacked = layer_idx is not None
    if w.qdata.ndim != (3 if stacked else 2):
        return None
    N, K = w.shape[-2:]
    group_size = w.block_size[-1]
    Kp = K // 2
    # the kernel needs whole groups inside each packed half AND scale
    # blocks of ≥8 sublane rows per half (Mosaic 8-row rule) → 8·g | Kp
    if group_size > Kp or Kp % (8 * group_size) != 0:
        return None
    if Kp % 128 != 0 or N % 128 != 0:
        return None
    mid = (w.quant_max + w.quant_min + 1) / 2 - w.quant_min

    def impl(x, w):
        xb = x.reshape(-1, K)
        if w.zero_point is None:
            zero = jnp.zeros_like(w.scale)
        elif int_domain:
            # float-equivalent zero for the fused (large-M) variant;
            # the decode variant reads the precomputed eff leaves
            zero = (
                (mid - w.zero_point.astype(jnp.float32))
                * w.scale.astype(jnp.float32)
            ).astype(w.scale.dtype)
        else:
            zero = w.zero_point
        kw = {}
        v = os.environ.get("TORCHAO_TPU_INT4_VARIANT")
        if v in ("fused", "group_partial", "batched_int8", "banded"):
            kw["variant"] = v
        if xb.shape[0] <= 16:  # decode-shaped calls only: the fused
            # prefill variant has its own (much tighter) VMEM budget
            for name in ("bn", "bkp"):  # block experimentation knobs
                ev = os.environ.get(f"TORCHAO_TPU_INT4_{name.upper()}")
                if ev:
                    kw[name] = int(ev)
        from torchao_tpu.kernels.autotune import (
            int4_matmul_candidates,
            lookup_or_tune,
        )

        qchunk = getattr(w, "qparams_eff_chunk", None)
        xorf = getattr(w, "nibbles_xored", False)
        tuned = lookup_or_tune(
            "int4_dq_matmul",
            (xb.shape[0], N, K, group_size),
            int4_matmul_candidates(xb.shape[0], N, K, group_size),
            lambda cfg, xi: int4_dq_matmul(
                xi, w.qdata, w.scale, zero,
                w.qparams_eff,
                group_size=group_size, mid=mid,
                layer_idx=layer_idx, qparams_chunk=qchunk,
                xored=xorf, **cfg,
            ),
            example_x=xb,
        )
        if tuned:
            kw = {**tuned, **kw}  # env variant override wins
        out = int4_dq_matmul(
            xb, w.qdata, w.scale, zero,
            w.qparams_eff,
            group_size=group_size, mid=mid, layer_idx=layer_idx,
            qparams_chunk=qchunk, xored=xorf, **kw,
        )
        return out.reshape(x.shape[:-1] + (N,))

    return impl
