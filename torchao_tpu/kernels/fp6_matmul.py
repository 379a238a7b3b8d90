"""Fused fp6 (ExMy e3m2) dequant-matmul Pallas kernel.

TPU replacement for the reference's fp6-LLM CUDA family
(``csrc/cuda/fp6_llm/fp6_linear.cu``, 1,354 LoC; A100 161.58 tok/s on the
Llama-3-8B row). The GPU kernel's bit-interleaved tensor-core layout is
meaningless on TPU; this kernel is built around two facts probed on this
hardware (see CLAUDE.md / PERF.md):

- Mosaic legalizes integer shifts only at i32, and u8→bf16 casts don't
  exist — so the decode NEVER shifts. All field extraction uses u8 ANDs
  plus the exact subtract-and-scale trick (integers ≤ 255 are exact in
  bf16), the same pattern as the int4 kernel's nibble unpack.
- every fp6 grid value ×32 is a small integer with ≤ 3 significant bits:
  ``v32 = sign · ((4+m)·[e>0] + 2m·[e=0]) · 2^e`` — EXACT in bf16, so
  the whole decode runs in bf16 via the product identity
  ``2^e = (1+e0)·(1+3·e1)·(1+15·e2)``  (e = e0 + 2·e1 + 4·e2)
  and the per-row scale applies once to the f32 output tile (÷32 folded
  in). No transcendentals, no i32 lane-density loss on the hot path.

Storage (K-major, chosen at quantize time — ``FloatxArray`` kmajor):
- ``s4[K/2, N]`` uint8: element k's 4-bit field ``m | e0<<2 | e1<<3`` in
  the low nibble for k < K/2, high nibble for k ≥ K/2 (half-split along
  K, exactly the int4 TILED layout).
- ``s2[K/4, N]`` uint8: element k's 2-bit field ``e2 | s<<1`` at bit
  position 2·(k div K/4) (quarter-split).
- ``scale[N]`` per-out-feature power-of-two scale.

``fp6_dq_matmul_reference`` is the jnp oracle used by tests.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv


def _bit_to_bf16(byte, mask: int, scale: float):
    """``(byte & mask) * scale`` as bf16 — ONE u8 AND + a widening cast
    + one multiply. Masks ≥ 128 widen through i16 (u8→i8 would wrap);
    smaller masks take the denser u8→i8 path. There is deliberately NO
    bf16→int cast anywhere in this kernel: mixing f→i downcasts with the
    unpack was measured to trigger pathological Mosaic relayout chains
    (167 s compiles, 14 GB/s — the round-3 fp6 bisect on hardware)."""
    v = byte & jnp.uint8(mask)
    if mask >= 128:
        f = v.astype(jnp.int16).astype(jnp.bfloat16)
    else:
        f = v.astype(jnp.int8).astype(jnp.bfloat16)
    return f if scale == 1.0 else f * jnp.bfloat16(scale)


def _decode_quarter(m, a, b, e2, s):
    """bf16 decode from 0/1-valued (a=e0, b=e1, e2, s) bit fields and
    the 0..3 mantissa m: ``v32 = mant · 2^e · sign`` with the exact
    product identity 2^e = (1+a)(1+3b)(1+15e2) and the subnormal branch
    folded in arithmetically (nz = [e>0] as a bit product)."""
    nz = 1 - (1 - a) * (1 - b) * (1 - e2)
    # normals: (4+m)·2^e;  subnormals (e=0): 2·m (= m·2^(1-bias-mbits)·32)
    mant = 2 * m + (4 - m) * nz
    p = (1 + a) * (1 + 3 * b) * (1 + 15 * e2)     # 2^e, exact
    return mant * p * (1 - 2 * s)                 # v32, exact bf16


def _kernel_fp6(
    l_ref,      # scalar prefetch: [1] int32 layer index
    x0_ref, x1_ref, x2_ref, x3_ref,   # [bm, bkq] bf16 — quarter slices
    s4a_ref,    # [1, bkq, bn] u8 — 4-bit shard rows (quarters 0 & 2)
    s4b_ref,    # [1, bkq, bn] u8 — 4-bit shard rows (quarters 1 & 3)
    s2_ref,     # [1, bkq, bn] u8 — 2-bit shard rows (all 4 quarters)
    out_ref, acc_ref, *, n_k_blocks: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s2 = s2_ref[0]
    xq = (x0_ref, x1_ref, x2_ref, x3_ref)
    for pair, s4_ref in ((0, s4a_ref), (1, s4b_ref)):
        byte = s4_ref[0]
        for half in (0, 1):
            q = pair + 2 * half                    # quarter index 0..3
            # every field is a DIRECT u8 AND on the raw byte at its bit
            # position, scaled back to 0/1 (0..3 for m) in bf16
            sh = 4 * half
            m = _bit_to_bf16(byte, 3 << sh, 1 / (1 << sh))
            a = _bit_to_bf16(byte, 4 << sh, 1 / (4 << sh))
            b = _bit_to_bf16(byte, 8 << sh, 1 / (8 << sh))
            e2 = _bit_to_bf16(s2, 1 << (2 * q), 1 / (1 << (2 * q)))
            s = _bit_to_bf16(s2, 2 << (2 * q), 1 / (2 << (2 * q)))
            w = _decode_quarter(m, a, b, e2, s)    # [bkq, bn] = v32
            acc_ref[:] += jnp.dot(
                xq[q][:], w, preferred_element_type=jnp.float32
            )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bn", "bkq", "interpret"),
)
def fp6_dq_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32
    s4: jnp.ndarray,       # [(L,) K/2, N] uint8 half-split 4-bit shard
    s2: jnp.ndarray,       # [(L,) K/4, N] uint8 quarter-split 2-bit shard
    scale: jnp.ndarray,    # [(L,) N] per-row power-of-two scale
    *,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    bkq: Optional[int] = None,
    interpret: bool = False,
    layer_idx=None,
) -> jnp.ndarray:
    """out[m, n] = Σ_k x[m, k] · fp6(k, n) · scale[n]."""
    M, K = x.shape
    stacked = layer_idx is not None
    N = s4.shape[-1]
    Q = K // 4
    assert s4.shape[-2] == K // 2 and s2.shape[-2] == Q, (
        s4.shape, s2.shape, K
    )

    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    if bn is None:
        bn = 2048
    bn = min(bn, N)
    if bkq is None:
        bkq = 512
    bkq = min(bkq, Q)
    while Q % bkq:
        bkq //= 2
    if bm is None:
        bm = M
    assert bm == M and M <= 16, (M, bm)
    nbk = Q // bkq
    nbq2 = (K // 2) // bkq          # s4 row-blocks per half

    if not stacked:
        s4 = s4[None]
        s2 = s2[None]
        scale = scale[None]
        layer_idx = 0
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))

    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(_kernel_fp6, n_k_blocks=nbk)
    nxq = K // bkq                   # x col-blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # x quarter slices: element k = q·Q + r
            pl.BlockSpec((bm, bkq), lambda i, j, k, l: (i, k)),
            pl.BlockSpec(
                (bm, bkq), lambda i, j, k, l: (i, k + nbk)
            ),
            pl.BlockSpec(
                (bm, bkq), lambda i, j, k, l: (i, k + 2 * nbk)
            ),
            pl.BlockSpec(
                (bm, bkq), lambda i, j, k, l: (i, k + 3 * nbk)
            ),
            # s4: rows r (quarters 0/2 in lo/hi nibble) and Q + r
            pl.BlockSpec(
                (1, bkq, bn), lambda i, j, k, l: (l[0], k, j)
            ),
            pl.BlockSpec(
                (1, bkq, bn), lambda i, j, k, l: (l[0], k + nbk, j)
            ),
            pl.BlockSpec(
                (1, bkq, bn), lambda i, j, k, l: (l[0], k, j)
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
        # the unrolled 4-quarter decode keeps several [bkq, bn] bf16
        # temporaries live; the default 16M scoped-VMEM limit rejects
        # bkq=512/bn=2048 (25.9M measured) while the chip accepts a
        # raised limit (probed with the int4 bkp=2048 experiment)
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=int(
                float(os.environ.get("TORCHAO_TPU_FP6_VMEM_MB", "64"))
                * 2**20
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * N * K,
            bytes_accessed=(K // 2) * N + (K // 4) * N + M * K * 4,
            transcendentals=0,
        ),
    )(lvec, x, x, x, x, s4, s4, s2)
    # per-row scale (power of two) ÷ 32 on the output tile
    sc = scale[lvec[0]] if True else scale
    out = out * (sc.astype(jnp.float32)[None, :] / 32.0).astype(out.dtype)
    return out


def pack_fp6_kmajor(codes: jnp.ndarray):
    """[N, K] 6-bit codes (s|e|m, exmy_encode order: s<<5 | e<<2 | m) →
    (s4 [K/2, N], s2 [K/4, N]) in the kernel's K-major layout."""
    N, K = codes.shape
    c = codes.astype(jnp.uint8).T                  # [K, N]
    m = c & 3
    e = (c >> 2) & 7
    s = (c >> 5) & 1
    f4 = (m | ((e & 3) << 2)).astype(jnp.uint8)    # m | e0<<2 | e1<<3
    f2 = (((e >> 2) & 1) | (s << 1)).astype(jnp.uint8)
    Q = K // 4
    # half-split nibbles for f4
    s4 = (f4[: K // 2] | (f4[K // 2:] << 4)).astype(jnp.uint8)
    # quarter-split 2-bit fields for f2
    s2 = (
        f2[:Q]
        | (f2[Q:2 * Q] << 2)
        | (f2[2 * Q:3 * Q] << 4)
        | (f2[3 * Q:] << 6)
    ).astype(jnp.uint8)
    return s4, s2


def fp6_dq_matmul_reference(x, s4, s2, scale):
    """jnp oracle with identical math (K-major kmajor layout)."""
    Kp2, N = s4.shape
    K = Kp2 * 2
    Q = K // 4
    f4_lo = s4 & 0xF
    f4_hi = s4 >> 4
    f4 = jnp.concatenate([f4_lo, f4_hi], axis=0)   # [K, N]
    f2 = jnp.concatenate(
        [(s2 >> (2 * q)) & 3 for q in range(4)], axis=0
    )                                               # [K, N]
    m = (f4 & 3).astype(jnp.float32)
    e = ((f4 >> 2) & 3).astype(jnp.int32) + ((f2 & 1).astype(jnp.int32) << 2)
    s = ((f2 >> 1) & 1).astype(jnp.float32)
    nz = (e > 0).astype(jnp.float32)
    v32 = (
        (2.0 * m + (4.0 - m) * nz)
        * jnp.exp2(e.astype(jnp.float32))
        * (1.0 - 2.0 * s)
    )
    w = v32 / 32.0 * scale.astype(jnp.float32)[None, :]
    return jax.lax.dot_general(
        x.astype(jnp.float32), w, (((1,), (0,)), ((), ())),
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# dispatch probe
# ---------------------------------------------------------------------------


def fp6_dq_matmul_available(x, w, layer_idx=None):
    """Returns an impl callable when the Pallas fp6 kernel supports this
    case (e3m2 K-major layout, aligned shapes, decode-shaped M)."""
    import os

    from torchao_tpu.qtypes.floatx import FloatxArray

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_FP6") == "1":
        return None
    if not isinstance(w, FloatxArray):
        return None
    if not getattr(w, "kmajor", False):
        return None
    if w.ebits != 3 or w.mbits != 2:
        return None
    stacked = layer_idx is not None
    if w.qdata.ndim != (3 if stacked else 2):
        return None
    N, K = w.shape[-2:]
    if K % 512 != 0 or N % 128 != 0:
        return None
    xb = x.reshape(-1, K)
    if xb.shape[0] > 16:
        return None  # decode-shaped GEMV path only; prefill dequantizes

    def impl(x, w):
        xb = x.reshape(-1, K)
        out = fp6_dq_matmul(
            xb, w.qdata, w.qdata2, w.scale, layer_idx=layer_idx,
        )
        return out.reshape(x.shape[:-1] + (N,))

    return impl


# ---------------------------------------------------------------------------
# Fused dual-plane kernel (round 4): ONE launch per matmul instead of the
# two plane rides (int4 kernel + int8 kernel). Same exact math as
# Fp6DualArray (v·32 = A + 16·B; out = ((x@A) + 16·(x@B)) · s/32) but the
# A nibbles and B int8 plane stream through a single grid — halving
# launch count, per-launch fill/drain, and the duplicated activation
# operands (fp6 e2e measured 544 GB/s on the two-ride path vs 600+ for
# the single-operand int paths; VERDICT r3 #9).
# ---------------------------------------------------------------------------


def _kernel_dual(
    l_ref,      # [1] int32 scalar prefetch: layer index
    x3_ref,     # [2nG, bm, g] bf16 — grouped x (A-plane batched dots)
    xf_ref,     # [bm, bkB] bf16 — flat x columns (B-plane dot)
    wa_ref,     # [1, bkp, bn] uint8 — A nibbles (pre-XORed, K-major)
    wb_ref,     # [1, bn, bkB] int8 — B plane ([N, K] orientation)
    s_ref,      # [1, 1, bn] bf16 — per-row scale / 32
    out_ref, acc_ref, *, n_k_blocks: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, bkp, bn = wa_ref.shape
    two_ng, bm, g = x3_ref.shape
    nG = two_ng // 2
    bg = bkp // g

    # ---- A plane: the batched-int8 nibble math with s=1, z=0, mid=8
    # (dq_lo = lo − 8, dq_hi = (b′ − lo)/16 — see int4_matmul) --------
    w = wa_ref[0]
    lo3 = (w & jnp.uint8(0xF)).astype(jnp.int8).reshape(bg, g, bn)
    b3 = w.astype(jnp.int8).reshape(bg, g, bn)   # pre-XORed bytes
    xlo = x3_ref[pl.ds(k * bg, bg)]
    xhi = x3_ref[pl.ds(nG + k * bg, bg)]
    xcat = jnp.concatenate([xlo, xhi], axis=1)            # [bg, 2bm, g]
    plo = jax.lax.dot_general(
        xcat, lo3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # [bg, 2bm, bn]
    pb = jax.lax.dot_general(
        xhi, b3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # [bg, bm, bn]
    acc_ref[:] += jnp.sum(
        plo[:, :bm, :] + (pb - plo[:, bm:, :]) * 0.0625, axis=0
    )
    # z2lo = −8 (constant): Σ_k x_lo[k]·(−8), broadcast over n
    acc_ref[:] += (-8.0) * jnp.sum(
        xlo, axis=(0, 2), dtype=jnp.float32
    )[:, None]

    # ---- B plane: flat mixed bf16×s8 dot (the int8wo form) ----------
    acc_ref[:] += 16.0 * jax.lax.dot_general(
        xf_ref[:], wb_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = (
            acc_ref[:] * s_ref[0, 0].astype(jnp.float32)[None, :]
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "bn", "bkp", "interpret"),
)
def fp6_dual_matmul(
    x: jnp.ndarray,        # [M, K] bf16
    wa: jnp.ndarray,       # [(L,) K/2, N] uint8 — A nibbles (XORed)
    wb: jnp.ndarray,       # [(L,) N, K] int8 — B plane
    s32: jnp.ndarray,      # [(L,) 1, N] — per-row scale / 32
    *,
    group: int = 32,
    bn: int = 2048,
    bkp: int = 512,
    interpret: bool = False,
    layer_idx=None,
) -> jnp.ndarray:
    """out = ((x@A) + 16·(x@B)) · s/32 — the EXACT fp6 matmul in one
    launch (``FloatxArray.to_dual_planes`` algebra)."""
    M, K = x.shape
    if layer_idx is None:
        wa, wb, s32 = wa[None], wb[None], s32[None]
        layer_idx = 0
    _, Kp, N = wa.shape
    assert Kp * 2 == K and wb.shape[-2:] == (N, K), (wa.shape, wb.shape)
    g = group
    assert Kp % (8 * g) == 0, (Kp, g)
    nG = Kp // g
    bkp = min(bkp, Kp)
    while Kp % bkp:
        bkp //= 2
    bg = bkp // g
    nbk = Kp // bkp
    bkB = 2 * bkp
    bn = min(bn, N)
    assert M <= 16, M  # decode-shaped GEMV path
    bm = M

    x3 = x.reshape(M, 2 * nG, g).transpose(1, 0, 2)       # [2nG, M, g]
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cdiv(M, bm), cdiv(N, bn), nbk),
        in_specs=[
            pl.BlockSpec((2 * nG, bm, g), lambda i, j, k, l: (0, 0, 0)),
            pl.BlockSpec((bm, bkB), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((1, bkp, bn), lambda i, j, k, l: (l[0], k, j)),
            pl.BlockSpec((1, bn, bkB), lambda i, j, k, l: (l[0], j, k)),
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_dual, n_k_blocks=nbk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * N * K,
            bytes_accessed=Kp * N + N * K + M * K * 4,
            transcendentals=0,
        ),
    )(lvec, x3, x, wa, wb, s32)


def fp6_dual_matmul_available(x, w, layer_idx=None):
    """Probe: Fp6DualArray whose planes satisfy the fused-kernel rules
    (TILED A-plane with XORed nibbles, PLAIN int8 B-plane, aligned)."""
    import os

    from torchao_tpu.qtypes.floatx import Fp6DualArray

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_FP6DUAL") == "1":
        return None
    if not isinstance(w, Fp6DualArray):
        return None
    stacked = layer_idx is not None
    a, b = w.a_plane, w.b_plane
    if a.qdata.ndim != (3 if stacked else 2):
        return None
    if not getattr(a, "nibbles_xored", False):
        return None
    N, K = w.shape[-2:]
    Kp = K // 2
    if Kp % 256 != 0 or N % 128 != 0 or str(b.qdata.dtype) != "int8":
        return None

    def impl(x, w):
        xb = x.reshape(-1, K)
        if xb.shape[0] > 16:
            return None
        a, b = w.a_plane, w.b_plane
        # per-row scale/32: row 0 of the replicated A-plane group scales
        s32 = a.scale[..., :1, :]
        out = fp6_dual_matmul(
            xb.astype(jnp.bfloat16), a.qdata, b.qdata, s32,
            layer_idx=layer_idx,
        )
        return out.reshape(x.shape[:-1] + (N,))

    if x.reshape(-1, K).shape[0] > 16:
        return None
    return impl
