"""Fused SwiGLU-FFN int4 megakernel: w13 matmul → silu·mul → w2 matmul
in ONE Pallas launch.

Why: each Pallas invocation costs a dispatch + pipeline fill/drain that
the decode profile puts at ~10-16 µs (a 14-grid-step kernel streams at
~82% of HBM while the 126-step output head reaches 95%). Fusing the two
FFN projections (the two largest matmuls, 72% of decode bytes) into one
launch removes a launch boundary AND the XLA glue between them
(silu/mul + the grouped-activation re-layout), ~0.5 ms/decode-step at
Llama-3-8B.

Mechanism: a single 1-D sequential grid with two phases.

- Phase 1 (steps ``[0, S1)``): the merged-qparams batched-int8 math of
  ``int4_matmul._kernel_bint8m`` over ``w13`` [L, Kp1, N13], writing
  per-column-block results into a VMEM ``h13`` scratch. The ``w2``
  operands' index maps FREEZE at block (0, 0) during this phase, so the
  revolving-window pipeline fetches them once and never again.
- Transition (step ``S1-1``): ``act = silu(h1)·h3`` computed in VMEM
  chunk-wise (h1 = first half of N13 columns, h3 = second half — the
  merged-w13 storage convention of ``models/llama``), then group-folded
  ONCE into a resident G-major 2-D ``[2·nG2·bm, g]`` scratch with the
  lane-legal placement construction (reshape whose minor stays 128 +
  tiny P/Q placement matmuls — Mosaic forbids sub-128-minor reshapes,
  i1 mask vectors, sub-i32 shifts, and the 3-D [bkp, bm, g] placement
  dot, which lowers to a rejected shape cast; this uses none of them).
- Phase 2: ``act @ w2`` with the same batched-int8 math; each step
  slices a ``[bg·bm, g]`` slab from the grouped scratch and widens it
  (at f32 — Mosaic's 32-bit rule for layout-changing ops) into the
  phase-1 x3 operand form. (Folding per step instead duplicated the
  layout work nj2× and serialized it against the MXU loop:
  99.8 vs 128 tok/s e2e on the 8B headline.)
  ``w13`` index maps freeze at their last phase-1 block.

Decode-shaped (M ≤ 8); larger M falls back to two kernel calls.
Replaces nothing in the reference directly — its torch.compile fuses
epilogues but cannot fuse across two ``_weight_int4pack_mm`` custom
calls either; this is TPU-first design headroom (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv


def _indicators(bkp: int, g: int):
    """(Ind [bkp, g], L [bkp, bg]) 0/1 f32 matrices built arithmetically
    (iota + min — no i1 vectors, no shifts; see _kernel_banded)."""
    bg = bkp // g
    r = jax.lax.broadcasted_iota(jnp.int32, (bkp, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bkp, g), 1)
    d = (r % g) - c
    ind = (1 - jnp.minimum(d * d, 1)).astype(jnp.float32)
    rL = jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 0)
    cL = jax.lax.broadcasted_iota(jnp.int32, (bkp, bg), 1)
    dL = (rL // g) - cL
    Lm = (1 - jnp.minimum(dL * dL, 1)).astype(jnp.float32)
    return ind, Lm


def _group_dot(acc_ref, xlo, xhi, w, slo, shi16, z2lo, z2hi, *,
               g: int, bn: int, xored: bool):
    """Shared batched-int8 block math (see _kernel_bint8): xlo/xhi
    [bg, bm, g] bf16, w [bkp, bn] uint8 (pre-XORed when ``xored``),
    qparam slabs [bg, bn] bf16; accumulates into acc_ref [bm, bn]."""
    bg, bm, _ = xlo.shape
    lo3 = (w & jnp.uint8(0xF)).astype(jnp.int8).reshape(bg, g, bn)
    b3 = (w if xored else (w ^ jnp.uint8(0x80))).astype(
        jnp.int8
    ).reshape(bg, g, bn)
    xcat = jnp.concatenate([xlo, xhi], axis=1)          # [bg, 2bm, g]
    plo = jax.lax.dot_general(
        xcat, lo3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    pb = jax.lax.dot_general(
        xhi, b3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    contrib = (
        plo[:, :bm, :] * slo.astype(jnp.float32)[:, None, :]
        + (pb - plo[:, bm:, :]) * shi16.astype(jnp.float32)[:, None, :]
    )
    acc_ref[:] += jnp.sum(contrib, axis=0)
    rs_lo = jnp.sum(xlo, axis=2)                        # [bg, bm]
    rs_hi = jnp.sum(xhi, axis=2)
    acc_ref[:] += jax.lax.dot_general(
        rs_lo, z2lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot_general(
        rs_hi, z2hi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    l_ref,
    x3_ref,      # [2nG1, 1, g] bf16 — grouped x (resident)
    w13_ref,     # [1, bkp, bn] uint8 block of [L, Kp1, N13]
    qp13_ref,    # [1, 4bg, bn] bf16 block (chunked block-major)
    w2_ref,      # [1, bkp, bn] uint8 block of [L, Kp2, N2]
    qp2_ref,     # [1, 4bg, bn] bf16
    out_ref,     # [1, bn] block of [1, N2]
    acc_ref,     # VMEM [1, bn] f32 (shared by both phases)
    h13_ref,     # VMEM [nj1, 1, bn] f32
    act3_ref,    # VMEM [2·nG2·bm, g] bf16 — GROUPED activations,
    #   G-major 2-D, written once at the phase transition; phase-2
    #   steps slice a [bg·bm, g] slab and widen/reshape it into the
    #   x3 operand form
    *,
    S1: int, nk1: int, nj1: int, nk2: int, nj2: int,
    g: int, bkp: int, bn: int, nG1: int, xored: bool,
):
    s = pl.program_id(0)
    bg = bkp // g
    bm = x3_ref.shape[1]
    phase1 = s < S1

    @pl.when(phase1)
    def _p1():
        k1 = s % nk1

        @pl.when(k1 == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xlo = x3_ref[pl.ds(k1 * bg, bg)]
        xhi = x3_ref[pl.ds(nG1 + k1 * bg, bg)]
        qp = qp13_ref[0]
        _group_dot(
            acc_ref, xlo, xhi, w13_ref[0],
            qp[:bg], qp[bg:2 * bg], qp[2 * bg:3 * bg], qp[3 * bg:],
            g=g, bn=bn, xored=xored,
        )

        @pl.when(k1 == nk1 - 1)
        def _():
            h13_ref[pl.ds(s // nk1, 1)] = acc_ref[:][None]

    @pl.when(s == S1 - 1)
    def _act():
        # one-time group-fold of the WHOLE activation into the phase-1
        # x3 layout. Block offsets are STATIC here (python loop), so
        # each fold is a static lane slice + transpose + one placement
        # matmul — vs the earlier per-phase-2-step dynamic folds, which
        # redid this work nj2 times per block and serialized it with
        # the MXU loop (e2e: 99.8 tok/s vs 128 baseline — the
        # megakernel's round-1 regression).
        # VMEM discipline (bn=2048 fits the 16 MB scoped budget by
        # ~2 MB only with all of these): silu is computed CHUNK-WISE
        # per fold block (no [nh, bm, bn] materialization), fold temps
        # stay 2-D and tiny, act3 is stored 2-D G-major.
        nh = nj1 // 2
        bgf = bkp // g
        gpr = 128 // g                # quant groups per 128-lane row
        nq = bkp // 128               # 128-lane rows per bkp block
        # lane-legal G-MAJOR fold, tiny operands, any bm:
        # [bm, bkp] → [bm·nq, 128] (minor stays 128 — the ONE legal
        # minor-split), then P3 [bg·bm, bm·nq] places row
        # (G·bm + m) ← a_rs row (m·nq + G//gpr), and gpr masked
        # Q-matmuls place each g-lane group slice. Every temp is
        # ≤ [bg·bm, 128]. The earlier bm>1 3-D fold
        # ([bkp, bm, g] dot) lowered to a vector<1024x8x32> →
        # vector<1024x256> shape cast Mosaic rejects on hw; the earlier
        # bm==1 transpose+indicator fold built [bkp, ·] temps that
        # padded to 512 KB each and blew the scoped-VMEM budget.
        rO = jax.lax.broadcasted_iota(
            jnp.int32, (bgf * bm, bm * nq), 0
        )
        cO = jax.lax.broadcasted_iota(
            jnp.int32, (bgf * bm, bm * nq), 1
        )
        Gr = rO // bm
        src = (rO % bm) * nq + Gr // gpr
        P3 = (1 - jnp.minimum((src - cO) ** 2, 1)).astype(jnp.float32)
        gsel = Gr[:, :1] % gpr                       # [bg·bm, 1]
        rQ = jax.lax.broadcasted_iota(jnp.int32, (128, g), 0)
        cQ = jax.lax.broadcasted_iota(jnp.int32, (128, g), 1)
        Qs = [
            (
                1 - jnp.minimum((rQ - (m * g + cQ)) ** 2, 1)
            ).astype(jnp.float32)
            for m in range(gpr)
        ]
        sels = [
            (1 - jnp.minimum((gsel - m) ** 2, 1)).astype(jnp.float32)
            for m in range(gpr)
        ]
        for b in range(2 * nk2):
            flat_row0 = b * bkp
            c, off = flat_row0 // bn, (flat_row0 % bn) // bkp
            h1c = h13_ref[pl.ds(c, 1)][0]             # [bm, bn] f32
            h3c = h13_ref[pl.ds(nh + c, 1)][0]
            actc = (h1c * jax.nn.sigmoid(h1c)) * h3c
            a = actc[:, off * bkp:(off + 1) * bkp]    # [bm, bkp] f32
            a_rs = a.reshape(bm * nq, 128)
            out1 = jax.lax.dot_general(
                P3, a_rs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # [bg·bm, 128]
            fold2 = jnp.zeros((bgf * bm, g), jnp.float32)
            for m in range(gpr):
                fold2 = fold2 + jax.lax.dot_general(
                    out1 * sels[m], Qs[m],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            act3_ref[pl.ds(b * bgf * bm, bgf * bm)] = fold2.astype(
                jnp.bfloat16
            )

    @pl.when(jnp.logical_not(phase1))
    def _p2():
        s2 = s - S1
        k2 = s2 % nk2

        @pl.when(k2 == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # act3 is 2-D G-major [2·nG2·bm, g]; widen to f32 for the
        # layout-changing step (Mosaic: minor-dim insertion/reshape at
        # 32-bit only), back to bf16 for the dot
        def slab(row0):
            raw = act3_ref[pl.ds(row0, bg * bm)].astype(jnp.float32)
            if bm == 1:
                return raw[:, None, :].astype(jnp.bfloat16)
            return raw.reshape(bg, bm, g).astype(jnp.bfloat16)

        xlo = slab(k2 * bg * bm)
        xhi = slab((nk2 + k2) * bg * bm)
        qp = qp2_ref[0]
        _group_dot(
            acc_ref, xlo, xhi, w2_ref[0],
            qp[:bg], qp[bg:2 * bg], qp[2 * bg:3 * bg], qp[3 * bg:],
            g=g, bn=bn, xored=xored,
        )

        @pl.when(k2 == nk2 - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bn", "bkp", "interpret", "xored"),
)
def ffn_int4_fused(
    x: jnp.ndarray,        # [1, K1] bf16
    w13: jnp.ndarray,      # [L, Kp1, N13] uint8 (pre-XORed nibbles)
    qp13: jnp.ndarray,     # [L, 4·nG1, N13] bf16, chunked block-major
    w2: jnp.ndarray,       # [L, Kp2, N2] uint8
    qp2: jnp.ndarray,      # [L, 4·nG2, N2] bf16
    layer_idx,
    *,
    group_size: int,
    bn: Optional[int] = None,
    bkp: int = 1024,
    interpret: bool = False,
    xored: bool = True,
) -> jnp.ndarray:
    M, K1 = x.shape
    assert M <= 8, "decode megakernel is M <= 8 (see module docstring)"
    L, Kp1, N13 = w13.shape
    _, Kp2, N2 = w2.shape
    g = group_size
    I = N13 // 2
    assert Kp1 * 2 == K1 and Kp2 * 2 == I, (K1, Kp1, I, Kp2)
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    nG1 = Kp1 // g

    if bn is None:
        # operand windows (2× double-buffered w13/qp13/w2/qp2) + the
        # padded transition-fold temporaries must stay under the 16 MB
        # scoped-VMEM cap: M == 1 fits bn=2048 with the 2-D folds
        # (bn=1024 measured 117.3 vs 128.2 tok/s e2e — smaller DMA
        # windows stream worse); bm > 1 keeps 1024 (3-D fold temps)
        bn = 2048 if M == 1 else 1024
    bn = min(bn, min(N13, N2))
    assert (
        Kp1 % bkp == 0 and Kp2 % bkp == 0
        and N13 % bn == 0 and N2 % bn == 0 and I % bn == 0
        and bkp % g == 0 and bn % bkp == 0
    ), (Kp1, Kp2, N13, N2, I, bn, bkp, g)

    nk1, nj1 = Kp1 // bkp, N13 // bn
    nk2, nj2 = Kp2 // bkp, N2 // bn
    S1 = nk1 * nj1
    S = S1 + nk2 * nj2
    bg = bkp // g

    x3 = x.reshape(M, 2 * nG1, g).transpose(1, 0, 2)   # [2nG1, M, g]
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))

    def w13_map(s, l):
        inphase = s < S1
        k1 = jnp.where(inphase, s % nk1, nk1 - 1)
        j1 = jnp.where(inphase, s // nk1, nj1 - 1)
        return (l[0], k1, j1)

    def w2_map(s, l):
        s2 = jnp.maximum(s - S1, 0)
        return (l[0], s2 % nk2, s2 // nk2)

    def out_map(s, l):
        s2 = jnp.maximum(s - S1, 0)
        return (0, s2 // nk2)

    kernel = functools.partial(
        _kernel, S1=S1, nk1=nk1, nj1=nj1, nk2=nk2, nj2=nj2,
        g=g, bkp=bkp, bn=bn, nG1=nG1, xored=xored,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((2 * nG1, M, g), lambda s, l: (0, 0, 0)),
            pl.BlockSpec((1, bkp, bn), w13_map),
            pl.BlockSpec((1, 4 * bg, bn), w13_map),
            pl.BlockSpec((1, bkp, bn), w2_map),
            pl.BlockSpec((1, 4 * bg, bn), w2_map),
        ],
        out_specs=pl.BlockSpec((M, bn), out_map),
        scratch_shapes=[
            pltpu.VMEM((M, bn), jnp.float32),
            pltpu.VMEM((nj1, M, bn), jnp.float32),
            # 2-D G-major [rows·M, g]: the [rows, M, g] form pads
            # (M, g) → (8, 128), up to 8× the bytes
            pltpu.VMEM((2 * (Kp2 // g) * M, g), jnp.bfloat16),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N2), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * (K1 * N13 + I * N2),
            bytes_accessed=Kp1 * N13 + Kp2 * N2
            + (qp13.size + qp2.size) * 2 // max(L, 1),
            transcendentals=I,
        ),
    )(lvec, x3, w13, qp13, w2, qp2)


def ffn_int4_fused_available(x, w13, w2, layer_idx):
    """Impl factory when BOTH FFN weights are stacked pre-XORed
    TILED_NIBBLES int4 arrays with block-chunked merged qparams and the
    megakernel's alignment holds; None otherwise (caller falls back to
    two ops.linear calls)."""
    import os

    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray

    # OPT-IN: three hardware iterations put the megakernel at parity
    # minus noise with the two-kernel w13 path on BOTH the single-
    # stream headline (127.65 vs 128.16 tok/s) and the 8-slot serving
    # aggregate (712.9 vs 729.2) — launch merging does not pay on this
    # platform; the transition fold costs what the launches save
    # (PERF.md round-2 megakernel table).
    if os.environ.get("TORCHAO_TPU_FFN_FUSED") != "1":
        return None
    if layer_idx is None:
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    import math as _math

    M = _math.prod(x.shape[:-1]) if x.ndim >= 2 else 0
    if M < 1 or M > 8:
        return None
    if M != 1 and M % 8 != 0:
        # a_rs = a.reshape(bm*nq, 128) requires whole sublane tiles
        return None
    for w in (w13, w2):
        if not isinstance(w, IntxArray):
            return None
        if w.packing_format is not PackingFormat.TILED_NIBBLES:
            return None
        if not getattr(w, "nibbles_xored", False):
            return None
        if w.qdata.ndim != 3:
            return None
        if w.qparams_eff is None or w.qparams_eff_chunk is None:
            return None
    g = w13.block_size[-1]
    if w2.block_size[-1] != g:
        return None
    if 128 % g != 0:
        return None  # the M == 1 lane-legal fold needs g | 128
    bkp = w13.qparams_eff_chunk * g
    if bkp != 1024:
        return None
    _, Kp1, N13 = w13.qdata.shape
    _, Kp2, N2 = w2.qdata.shape
    I = N13 // 2
    bn = 2048 if M == 1 else 1024
    if not (
        Kp1 % bkp == 0 and Kp2 % bkp == 0 and Kp2 * 2 == I
        and N13 % bn == 0 and N2 % bn == 0 and I % bn == 0
    ):
        return None

    def impl(x, w13, w2):
        xb = x.reshape(M, -1)
        out = ffn_int4_fused(
            xb, w13.qdata, w13.qparams_eff, w2.qdata, w2.qparams_eff,
            layer_idx, group_size=g, bn=bn, bkp=bkp,
        )
        return out.reshape(x.shape[:-1] + (N2,))

    return impl
