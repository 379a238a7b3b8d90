"""Quantized-KV flash-decode attention Pallas kernel.

TPU replacement for the reference's int8 SDPA (``csrc/cpu/int8_sdpa.cpp``)
and the ``AffineQuantizedKVCache`` dequantize-whole-cache-per-step pattern
(``_models/llama/model.py:198-240``): the kernel consumes the int8 KV
cache + per-token scales *directly*, dequantizing block-by-block in VMEM —
cache HBM traffic is the int8 bytes, never a materialized bf16 copy.

Decode case (T=1 per step, GQA): one grid cell per (batch, kv-head), an
online-softmax sweep over key blocks with running (m, l, acc) in VMEM
scratch. Query heads of one GQA group ride the sublane dim.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv

NEG_INF = -1e30


def _dequant_kv_block(q8, sc, kv_bits: int):
    """Dequantize one KV block in VMEM. int8: plain cast·scale. int4:
    bytes pack elements (d, d + Dh/2) as ``(q_lo+8) | ((q_hi+8)<<4)``;
    unpack uses the XOR-rebias identity ``(b ^ 0x80) as i8 = lo_u +
    16·q_hi`` (Mosaic legalizes no u8→bf16 casts and no sub-i32 shifts
    — see int4_matmul.py)."""
    if kv_bits == 8:
        return q8.astype(jnp.bfloat16) * sc.astype(jnp.bfloat16)
    lo_u = (q8 & jnp.uint8(0xF)).astype(jnp.int8).astype(jnp.bfloat16)
    bp = (q8 ^ jnp.uint8(0x80)).astype(jnp.int8).astype(jnp.bfloat16)
    lo = lo_u - jnp.bfloat16(8.0)                       # q_lo
    hi = (bp - lo_u) * jnp.bfloat16(0.0625)             # q_hi
    full = jnp.concatenate([lo, hi], axis=-1)           # [bs, Dh]
    return full * sc.astype(jnp.bfloat16)


def _kernel(
    pos_ref,  # scalar prefetch: [B] int32 — position of the FIRST query
    q_ref,    # [1, 1, bq, Dh] bf16 — rows t-major (global row r → t=r//G)
    kq_ref,   # [1, 1, bs, Dh] int8 — or [.., Dh/2] uint8 when kv_bits=4
    ks_ref,   # [1, 1, bs, 1] bf16
    vq_ref,   # [1, 1, bs, Dh] int8 — or packed uint8
    vs_ref,   # [1, 1, bs, 1] bf16
    out_ref,  # [1, 1, bq, Dh] f32
    m_ref, l_ref, acc_ref,
    *, bs: int, scale: float, n_s_blocks: int, rows_per_t: int,
    kv_bits: int = 8, ablate: str = "none",
):
    """``ablate`` is a DIAGNOSTIC-ONLY knob (scripts/attn_probe.py):
    every value except "none" computes WRONG attention, removing kernel
    stages cumulatively to attribute the per-block cost —
    "noexp" (exp→identity) → "nosoftmax" (no max/exp/l chain) →
    "nomaskexp" (also no causal mask) → "dotsonly" (raw dots only)."""
    s = pl.program_id(3)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[pl.program_id(0)]
    block_start = s * bs
    bq = q_ref.shape[2]
    row0 = pl.program_id(2) * bq           # first global query row
    # last query position covered by this q block
    t_max = (row0 + bq - 1) // rows_per_t

    # query row r has absolute position pos + r // rows_per_t; this key
    # block is relevant if any row in the q block can see it
    @pl.when(block_start <= pos + t_max)
    def _():
        q = q_ref[0, 0]                      # [bq, Dh]
        if ablate == "dotsonly":
            raw = jax.lax.dot_general(
                q, kq_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pv = jax.lax.dot_general(
                raw.astype(jnp.bfloat16), vq_ref[0, 0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] += pv
            return
        if kv_bits == 8:
            # no K dequantization: mixed bf16×s8 dot is MXU-native
            # (probed), and the per-key scale factors out of the dot —
            # scores[g,s] = (q·k_q[s])·k_s[s]. The int8→bf16 cast was
            # the long-context bottleneck (int8 (32,128) tiles retile
            # expensively to bf16 — PERF.md diagnosis).
            raw = jax.lax.dot_general(
                q, kq_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # [bq, bs]
            srow = jnp.swapaxes(
                ks_ref[0, 0].astype(jnp.float32), 0, 1
            )                                 # [1, bs]
            scores = raw * srow * scale
        else:
            k = _dequant_kv_block(kq_ref[0, 0], ks_ref[0, 0], kv_bits)
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                         # [R, bs]

        if ablate not in ("nomaskexp",):
            idx = block_start + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, dimension=1
            )
            row_t = (row0 + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, dimension=0
            )) // rows_per_t
            mask_val = (
                jnp.float32(0.0)
                if ablate in ("nosoftmax",) else NEG_INF
            )
            scores = jnp.where(idx <= pos + row_t, scores, mask_val)

        if ablate in ("nosoftmax", "nomaskexp"):
            p = scores
            alpha = jnp.float32(1.0)
            m_new = m_ref[:]
        else:
            m_old = m_ref[:]                  # [G, 1]
            m_new = jnp.maximum(
                m_old, jnp.max(scores, axis=1, keepdims=True)
            )
            if ablate == "noexp":
                p = scores - m_new            # [G, bs] (exp → identity)
                alpha = m_old - m_new
            else:
                p = jnp.exp(scores - m_new)   # [G, bs]
                alpha = jnp.exp(m_old - m_new)  # [G, 1]

        if kv_bits == 8:
            # fold the per-key V scale into p (score-sized, tiny) and
            # dot p directly against int8 V — no V dequantization
            vrow = jnp.swapaxes(
                vs_ref[0, 0].astype(jnp.float32), 0, 1
            )                                 # [1, bs]
            p2 = (p * vrow).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p2, vq_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # [G, Dh]
        else:
            v = _dequant_kv_block(vq_ref[0, 0], vs_ref[0, 0], kv_bits)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # [G, Dh]

        m_ref[:] = m_new
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == n_s_blocks - 1)
    def _():
        out_ref[0, 0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "bs", "bq", "rows_per_t", "fold_heads", "interpret",
        "ablate",
    ),
)
def quantized_kv_decode_attention(
    q: jnp.ndarray,        # [B, Hkv, R, Dh] bf16 — R = T·G, t-major rows
    k_q: jnp.ndarray,      # [B, Hkv, S, Dh] int8
    k_scale: jnp.ndarray,  # [B, Hkv, S, 1]
    v_q: jnp.ndarray,      # [B, Hkv, S, Dh] int8
    v_scale: jnp.ndarray,  # [B, Hkv, S, 1]
    pos: jnp.ndarray,      # scalar or [B] int32: position of query t=0
    *,
    scale: Optional[float] = None,
    bs: int = 1024,
    bq: Optional[int] = None,          # query-row block (prefill); None → R
    rows_per_t: Optional[int] = None,  # = G; None → R (decode, T=1)
    fold_heads: Optional[bool] = None,  # None → auto (VMEM-budgeted)
    interpret: bool = False,
    ablate: str = "none",  # DIAGNOSTIC ONLY — see _kernel docstring
) -> jnp.ndarray:
    """Returns [B, Hkv, R, Dh] f32 attention output. T=1 (decode) by
    default; for prefill pass ``rows_per_t=G`` with R = T·G rows and
    causal masking ``key ≤ pos + t`` is applied per query row. Long
    prefills additionally block over query rows (``bq``) — full
    flash-attention tiling, O(bq·bs) VMEM instead of O(R·S).

    ``k_q``/``v_q`` may be int8 [B, Hkv, S, Dh], or int4 packed
    2-per-uint8 along Dh ([B, Hkv, S, Dh/2]; byte d packs elements d
    and d + Dh/2, offset-binary nibbles) — kv_bits inferred from the
    last-dim ratio."""
    B, Hkv, R, Dh = q.shape
    if rows_per_t is None:
        rows_per_t = R
    S = k_q.shape[2]
    kv_bits = 4 if k_q.shape[-1] * 2 == Dh else 8
    dh_store = k_q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(Dh)
    bs = min(bs, S)
    while S % bs:
        bs //= 2
    if bq is None:
        bq = R
    bq = min(bq, R)
    while R % bq:  # grid needs R | bq; masking stays exact per row
        bq //= 2
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")

    # head-folded kernel: all Hkv heads in one grid step via batched
    # dots — 8× fewer grid steps. Measured on this platform (PERF.md):
    # NOT faster at S=8192 in isolation (823 vs 691 µs — both runs are
    # DMA-serialized in a single-op loop, so neither number reflects
    # pipelined decode). Opt-in (TORCHAO_TPU_ATTN_FOLD_HEADS=1 or
    # fold_heads=True) pending an end-to-end long-context measurement.
    if ablate != "none":
        fold_heads = False  # ablations exist only in the per-head kernel
    if fold_heads is None:
        import os

        fold_heads = (
            os.environ.get("TORCHAO_TPU_ATTN_FOLD_HEADS") == "1"
        )
    if fold_heads:
        def _fold_bytes(bs_c):
            # k/v int blocks + bf16 dequants (≈6·H·bs·Dh) + f32 scores
            # and exp probs (≈8·H·bq·bs) + acc/out (≈8·H·bq·Dh)
            return (
                Hkv * bs_c * Dh * 6
                + Hkv * bq * bs_c * 8
                + Hkv * bq * Dh * 8
            )

        bs_f = bs
        while bs_f > 256 and _fold_bytes(bs_f) > 12 * 2**20:
            bs_f //= 2
        fits = _fold_bytes(bs_f) <= 12 * 2**20 and S % bs_f == 0
        fold_heads = fits
        bs = bs_f if fold_heads else bs

    n_s = S // bs
    n_q = R // bq

    if fold_heads:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_q, n_s),
            in_specs=[
                pl.BlockSpec(
                    (1, Hkv, bq, Dh), lambda b, iq, s, *p: (b, 0, iq, 0)
                ),
                pl.BlockSpec(
                    (1, Hkv, bs, dh_store),
                    lambda b, iq, s, *p: (b, 0, s, 0),
                ),
                pl.BlockSpec(
                    (1, Hkv, bs, 1), lambda b, iq, s, *p: (b, 0, s, 0)
                ),
                pl.BlockSpec(
                    (1, Hkv, bs, dh_store),
                    lambda b, iq, s, *p: (b, 0, s, 0),
                ),
                pl.BlockSpec(
                    (1, Hkv, bs, 1), lambda b, iq, s, *p: (b, 0, s, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, bq, Dh), lambda b, iq, s, *p: (b, 0, iq, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, bq, 1), jnp.float32),
                pltpu.VMEM((Hkv, bq, 1), jnp.float32),
                pltpu.VMEM((Hkv, bq, Dh), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _kernel_heads, bs=bs, scale=scale, n_s_blocks=n_s,
            rows_per_t=rows_per_t, kv_bits=kv_bits,
        )
        out_call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dh), jnp.float32),
            interpret=interpret,
        )
        pos_vec = jnp.broadcast_to(
            jnp.atleast_1d(pos).astype(jnp.int32), (B,)
        )
        return out_call(pos_vec, q, k_q, k_scale, v_q, v_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_q, n_s),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, Dh), lambda b, h, iq, s, *p: (b, h, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, bs, dh_store), lambda b, h, iq, s, *p: (b, h, s, 0)
            ),
            pl.BlockSpec(
                (1, 1, bs, 1), lambda b, h, iq, s, *p: (b, h, s, 0)
            ),
            pl.BlockSpec(
                (1, 1, bs, dh_store), lambda b, h, iq, s, *p: (b, h, s, 0)
            ),
            pl.BlockSpec(
                (1, 1, bs, 1), lambda b, h, iq, s, *p: (b, h, s, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, Dh), lambda b, h, iq, s, *p: (b, h, iq, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, bs=bs, scale=scale, n_s_blocks=n_s,
        rows_per_t=rows_per_t, kv_bits=kv_bits, ablate=ablate,
    )
    out_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dh), jnp.float32),
        interpret=interpret,
    )
    pos_vec = jnp.broadcast_to(
        jnp.atleast_1d(pos).astype(jnp.int32), (B,)
    )
    return out_call(pos_vec, q, k_q, k_scale, v_q, v_scale)


def _kernel_smajor(
    pos_ref,  # scalar prefetch: [B] int32
    q_ref,    # [1, Hkv, bq, Dh] bf16
    kq_ref,   # [1, bs, Hkv·dh_store] int8/uint8 — S-major fat rows
    ks_ref,   # [1, bs, Hkv] bf16
    vq_ref,   # [1, bs, Hkv·dh_store]
    vs_ref,   # [1, bs, Hkv] bf16
    out_ref,  # [1, Hkv, bq, Dh] f32
    m_ref, l_ref, acc_ref,
    *, bs: int, scale: float, n_s_blocks: int, rows_per_t: int,
    kv_bits: int = 8, n_heads: int = 8,
):
    """S-major cache layout: one fat [bs, Hkv·Dh] DMA per block (all
    heads in a row) instead of Hkv thin [bs, Dh] stripes — the thin
    stripes capped cache streaming at ~50 GB/s (PERF.md long-context
    diagnosis). The per-head split happens in VMEM (reshape +
    transpose), then the math is the head-folded batched-dot kernel."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[pl.program_id(0)]
    block_start = s * bs
    H = n_heads
    bq = q_ref.shape[2]
    row0 = pl.program_id(1) * bq
    t_max = (row0 + bq - 1) // rows_per_t

    def split_heads(flat, sc):
        # [bs, H·dh] → [H, bs, dh'] dequantized. Minor-dim insertion is
        # Mosaic-legal only at 32 bit — widen the scale first.
        dh = flat.shape[-1] // H
        x3 = jnp.swapaxes(flat.reshape(bs, H, dh), 0, 1)
        s3 = jnp.swapaxes(sc.astype(jnp.float32), 0, 1)[:, :, None]
        return _dequant_kv_block(x3, s3.astype(jnp.bfloat16), kv_bits)

    @pl.when(block_start <= pos + t_max)
    def _():
        q = q_ref[0]                                    # [H, bq, Dh]
        k = split_heads(kq_ref[0], ks_ref[0])           # [H, bs, Dh]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                       # [H, bq, bs]

        idx = block_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=2
        )
        row_t = (row0 + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )) // rows_per_t
        scores = jnp.where(idx <= pos + row_t, scores, NEG_INF)

        m_old = m_ref[:]
        m_new = jnp.maximum(
            m_old, jnp.max(scores, axis=2, keepdims=True)
        )
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_old - m_new)

        v = split_heads(vq_ref[0], vs_ref[0])           # [H, bs, Dh]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

        m_ref[:] = m_new
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == n_s_blocks - 1)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "bs", "bq", "rows_per_t", "interpret"),
)
def quantized_kv_attention_smajor(
    q: jnp.ndarray,        # [B, Hkv, R, Dh] bf16 — R = T·G t-major rows
    k_q: jnp.ndarray,      # [B, S, Hkv·Dh'] int8 (or uint8 packed int4)
    k_scale: jnp.ndarray,  # [B, S, Hkv]
    v_q: jnp.ndarray,      # [B, S, Hkv·Dh']
    v_scale: jnp.ndarray,  # [B, S, Hkv]
    pos: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bs: int = 1024,
    bq: Optional[int] = None,
    rows_per_t: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """S-major-cache flash attention (see ``_kernel_smajor``). Returns
    [B, Hkv, R, Dh] f32."""
    B, Hkv, R, Dh = q.shape
    if rows_per_t is None:
        rows_per_t = R
    S = k_q.shape[1]
    flat = k_q.shape[-1]
    kv_bits = 4 if flat * 2 == Hkv * Dh else 8
    if scale is None:
        scale = 1.0 / math.sqrt(Dh)
    bs = min(bs, S)
    while S % bs:
        bs //= 2
    if bq is None:
        bq = R
    bq = min(bq, R)
    while R % bq:
        bq //= 2
    # VMEM: fat k/v blocks + bf16 dequants + scores
    while bs > 256 and (
        bs * flat * 6 + Hkv * bq * bs * 8 > 12 * 2**20
    ):
        bs //= 2
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    n_s = S // bs
    n_q = R // bq

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_q, n_s),
        in_specs=[
            pl.BlockSpec(
                (1, Hkv, bq, Dh), lambda b, iq, s, *p: (b, 0, iq, 0)
            ),
            pl.BlockSpec(
                (1, bs, flat), lambda b, iq, s, *p: (b, s, 0)
            ),
            pl.BlockSpec(
                (1, bs, Hkv), lambda b, iq, s, *p: (b, s, 0)
            ),
            pl.BlockSpec(
                (1, bs, flat), lambda b, iq, s, *p: (b, s, 0)
            ),
            pl.BlockSpec(
                (1, bs, Hkv), lambda b, iq, s, *p: (b, s, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, bq, Dh), lambda b, iq, s, *p: (b, 0, iq, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, bq, 1), jnp.float32),
            pltpu.VMEM((Hkv, bq, 1), jnp.float32),
            pltpu.VMEM((Hkv, bq, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_smajor, bs=bs, scale=scale, n_s_blocks=n_s,
        rows_per_t=rows_per_t, kv_bits=kv_bits, n_heads=Hkv,
    )
    out_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dh), jnp.float32),
        interpret=interpret,
    )
    pos_vec = jnp.broadcast_to(
        jnp.atleast_1d(pos).astype(jnp.int32), (B,)
    )
    return out_call(pos_vec, q, k_q, k_scale, v_q, v_scale)


def _kernel_bdq(
    l_ref,    # scalar prefetch: [1] int32 stacked-layer index (0 if unstacked)
    pos_ref,  # scalar prefetch: [B] int32
    qbd_ref,  # [1, H·G, H·Dh] bf16 — block-diagonal Q (built in XLA)
    kq_ref,   # [1, 1, H·Dh, bs] int8 — one layer's D-major K cache block
    ks_ref,   # [1, 1, H, bs] bf16
    vq_ref,   # [1, 1, bs, H·Dh] int8 — one layer's S-major V cache block
    vs_ref,   # [1, 1, H, bs] bf16
    out_ref,  # [1, H·G, Dh] f32
    m_ref, l_ref_s, acc_ref,
    *, bs: int, scale: float, n_s_blocks: int, n_heads: int, dh: int,
    stub: bool = False,
):
    """Block-diagonal-Q flash decode on the split flat cache.

    The per-head kernels stream the cache in thin [bs, Dh=128] stripes
    and small K=128 dots — measured ~50 GB/s at S=8k (PERF.md), while
    the weight kernels' fat-2D-block pattern reaches 600+ GB/s. This
    kernel reproduces the weight-kernel memory shape exactly: one fat
    ~1 MB int8 block per grid step covering ALL heads, and per-head
    structure lives in the *query*: with

      ``Qbd[(h,g), (h',d)] = q[h,g,d]·[h == h']``

    one K = H·Dh contraction computes every head's scores as a single
    mixed bf16×s8 MXU dot (native, probed); P·V likewise rides one fat
    dot producing [HG, H·Dh], and the (h'==h) diagonal band is
    extracted by an f32 minor-dim reshape (legal at 32 bit) + masked
    sum over h'. The H× wasted MXU flops are free on a memory-bound
    kernel.

    Layout is SPLIT so both dots contract over the rhs MAJOR dim (the
    MXU-natural orientation): K is stored D-major ([H·Dh, S] — scores
    = Qbd @ Kblk directly) while V stays S-major ([S, H·Dh] — out =
    P @ Vblk directly). A single S-major layout for both would make
    the score dot ``A @ Bᵀ``, forcing Mosaic to transpose each 1 MB
    int8 block in VMEM — measured 22 GB/s end-to-end vs per-head's 31
    (first bdq iteration). Scales are [H, S] so per-head rows need no
    in-kernel transpose either, just a G-fold sublane repeat."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref_s[:] = jnp.zeros_like(l_ref_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[pl.program_id(0)]
    block_start = s * bs
    H, G = n_heads, qbd_ref.shape[1] // n_heads

    if stub:
        # CEILING PROBE ONLY (wrong math): identical launches, blocks
        # and streams — both fat dots run on the raw bytes — but the
        # softmax/scale/band work is stubbed out. real≈stub ⇒ the
        # attention stream's rate is launch/DMA-structural; real≪stub
        # ⇒ kernel-side compute steals streaming time.
        @pl.when(block_start <= pos)
        def _():
            raw = jax.lax.dot_general(
                qbd_ref[0], kq_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [HG, bs]
            wide = jax.lax.dot_general(
                raw.astype(jnp.bfloat16), vq_ref[0, 0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [HG, HDh]
            acc_ref[:] += wide[:, :dh]
            l_ref_s[:] += ks_ref[0, 0, :1, :1] + vs_ref[0, 0, :1, :1]

        @pl.when(s == n_s_blocks - 1)
        def _():
            out_ref[0] = acc_ref[:] + l_ref_s[:]

        return

    @pl.when(block_start <= pos)
    def _():
        qbd = qbd_ref[0]                                 # [HG, HDh]
        raw = jax.lax.dot_general(
            qbd, kq_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [HG, bs]
        # per-(head, key) scale rows, repeated G-fold: [H, bs] → [HG, bs]
        kst = jnp.repeat(ks_ref[0, 0].astype(jnp.float32), G, axis=0)
        scores = raw * kst * scale

        idx = block_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        scores = jnp.where(idx <= pos, scores, NEG_INF)

        m_old = m_ref[:]                                 # [HG, 1]
        m_new = jnp.maximum(
            m_old, jnp.max(scores, axis=1, keepdims=True)
        )
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_old - m_new)

        vst = jnp.repeat(vs_ref[0, 0].astype(jnp.float32), G, axis=0)
        p2 = (p * vst).astype(jnp.bfloat16)
        wide = jax.lax.dot_general(
            p2, vq_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [HG, HDh]
        # diagonal-band extraction: [HG, HDh] → [HG, H, Dh], keep h'==h
        w3 = wide.reshape(H * G, H, dh)
        hsel = (
            jax.lax.broadcasted_iota(jnp.int32, (H * G, H, dh), 0) // G
            == jax.lax.broadcasted_iota(jnp.int32, (H * G, H, dh), 1)
        )
        pv = jnp.sum(jnp.where(hsel, w3, 0.0), axis=1)   # [HG, Dh]

        m_ref[:] = m_new
        l_ref_s[:] = l_ref_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == n_s_blocks - 1)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref_s[:], 1e-30)


def _kernel_bdq_i4(
    l_ref,    # scalar prefetch: [1] int32 stacked-layer index
    pos_ref,  # scalar prefetch: [B] int32
    qlo_ref,  # [1, H·G, H·Dh/2] bf16 — Qbd columns for each head's lo half
    qhi_ref,  # [1, H·G, H·Dh/2] bf16 — hi half
    kq_ref,   # [1, 1, H·Dh/2, bs] uint8 — packed int4 D-major K block
    ks_ref,   # [1, 1, H, bs]
    vq_ref,   # [1, 1, bs, H·Dh/2] uint8 — packed int4 S-major V block
    vs_ref,   # [1, 1, H, bs]
    out_ref,  # [1, H·G, Dh] f32
    m_ref, l_ref_s, acc_ref,
    *, bs: int, scale: float, n_s_blocks: int, n_heads: int, dh: int,
    stub: bool = False,
):
    """Packed-int4 variant of ``_kernel_bdq`` — HALF the cache bytes at
    the same fat-block streaming shape (the long-context capacity
    option, 2× context per HBM byte, now on the fast split-flat path).

    int4 KV is packed 2-per-byte WITHIN each head along Dh (byte
    (h, d) holds offset-binary nibbles of elements d and d + Dh/2 —
    ``model._quantize_kv_int4``), so head-sharded TP still shards whole
    bytes. Nibbles reach the MXU as int8 with zero float casts via the
    weight kernel's identities (``lo = b & 0xF`` = q_lo + 8;
    ``(b ^ 0x80) as i8 = lo + 16·(q_hi − 8)``):

      scores_lo = Q_lo @ lo − 8·rowsum(Q_lo)       (offset-binary rebias)
      scores_hi = (Q_hi @ b′ − Q_hi @ lo) / 16
      P·V: one dot against [lo | b′], recombined per half the same way.
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref_s[:] = jnp.zeros_like(l_ref_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[pl.program_id(0)]
    block_start = s * bs
    H, G = n_heads, qlo_ref.shape[1] // n_heads

    if stub:
        # CEILING PROBE ONLY (wrong math) — see ``_kernel_bdq``: same
        # launches/blocks/streams, one unpack + two fat dots, no
        # softmax/rebias/band work
        @pl.when(block_start <= pos)
        def _():
            kb = kq_ref[0, 0]
            k_lo = (kb & jnp.uint8(0xF)).astype(jnp.int8)
            raw = jax.lax.dot_general(
                qlo_ref[0], k_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [HG, bs]
            vb = vq_ref[0, 0]
            v_lo = (vb & jnp.uint8(0xF)).astype(jnp.int8)
            wide = jax.lax.dot_general(
                raw.astype(jnp.bfloat16), v_lo,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [HG, HD2]
            acc_ref[:] += wide[:, :dh]
            l_ref_s[:] += ks_ref[0, 0, :1, :1] + vs_ref[0, 0, :1, :1]

        @pl.when(s == n_s_blocks - 1)
        def _():
            out_ref[0] = acc_ref[:] + l_ref_s[:]

        return

    @pl.when(block_start <= pos)
    def _():
        qlo = qlo_ref[0]                                 # [HG, HD2]
        qhi = qhi_ref[0]
        kb = kq_ref[0, 0]                                # [HD2, bs] u8
        k_lo = (kb & jnp.uint8(0xF)).astype(jnp.int8)
        k_bp = (kb ^ jnp.uint8(0x80)).astype(jnp.int8)

        q2 = jnp.concatenate([qlo, qhi], axis=0)         # [2HG, HD2]
        dlo2 = jax.lax.dot_general(
            q2, k_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [2HG, bs]
        d2 = jax.lax.dot_general(
            qhi, k_bp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [HG, bs]
        HG = qlo.shape[0]
        rs_lo = jnp.sum(
            qlo.astype(jnp.float32), axis=1, keepdims=True
        )                                                # [HG, 1]
        raw = (
            dlo2[:HG] - 8.0 * rs_lo
            + (d2 - dlo2[HG:]) * 0.0625
        )
        kst = jnp.repeat(ks_ref[0, 0].astype(jnp.float32), G, axis=0)
        scores = raw * kst * scale

        idx = block_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        scores = jnp.where(idx <= pos, scores, NEG_INF)

        m_old = m_ref[:]
        m_new = jnp.maximum(
            m_old, jnp.max(scores, axis=1, keepdims=True)
        )
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_old - m_new)

        vst = jnp.repeat(vs_ref[0, 0].astype(jnp.float32), G, axis=0)
        p2 = (p * vst).astype(jnp.bfloat16)
        vb = vq_ref[0, 0]                                # [bs, HD2] u8
        v_lo = (vb & jnp.uint8(0xF)).astype(jnp.int8)
        v_bp = (vb ^ jnp.uint8(0x80)).astype(jnp.int8)
        rhs = jnp.concatenate([v_lo, v_bp], axis=1)      # [bs, HD]
        wide2 = jax.lax.dot_general(
            p2, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [HG, HD]
        HD2 = v_lo.shape[1]
        a_part = wide2[:, :HD2]
        b_part = wide2[:, HD2:]
        rsp = jnp.sum(
            p2.astype(jnp.float32), axis=1, keepdims=True
        )                                                # [HG, 1]
        out_lo = a_part - 8.0 * rsp                      # [HG, HD2]
        out_hi = (b_part - a_part) * 0.0625
        dh2 = dh // 2
        HG = out_lo.shape[0]
        HD2 = out_lo.shape[1]
        # band-select + per-half column placement WITHOUT any sub-128
        # minor reshape (Mosaic rejects [HG, HD2] → [HG, H, dh/2]):
        # zero every h' != row's head arithmetically (no i1 vectors —
        # Mosaic "invalid relayout", CLAUDE.md), then one tiny constant
        # matmul per half scatters compact columns (h·dh2 + d) to their
        # head-contiguous positions d / d + dh2 of [HG, Dh].
        db = (
            jax.lax.broadcasted_iota(jnp.int32, (HG, HD2), 1) // dh2
            - jax.lax.broadcasted_iota(jnp.int32, (HG, HD2), 0) // G
        )
        band = (1 - jnp.minimum(db * db, 1)).astype(jnp.float32)
        c_mod = jax.lax.broadcasted_iota(jnp.int32, (HD2, dh), 0) % dh2
        d_col = jax.lax.broadcasted_iota(jnp.int32, (HD2, dh), 1)
        d_lo = c_mod - d_col
        s_lo = (
            (1 - jnp.minimum(d_lo * d_lo, 1)) * (1 - d_col // dh2)
        ).astype(jnp.float32)
        d_hi = c_mod - (d_col - dh2)
        s_hi = (
            (1 - jnp.minimum(d_hi * d_hi, 1)) * (d_col // dh2)
        ).astype(jnp.float32)
        pv = jax.lax.dot_general(
            out_lo * band, s_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            out_hi * band, s_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [HG, Dh]

        m_ref[:] = m_new
        l_ref_s[:] = l_ref_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == n_s_blocks - 1)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref_s[:], 1e-30)


def bdq_compiled_supported(head_dim: int) -> bool:
    """True when the block-diagonal-Q decode kernel has a compiled
    Mosaic route for this head dim. Sub-128 head dims hit an
    "unsupported shape cast" on the [HG, H·Dh] → [HG, H, Dh] band
    extraction (minor dim < 128); callers on real TPU should use the
    head-major ``quantized_kv_decode_attention`` kernel instead
    (ADVICE r4 medium)."""
    return head_dim >= 128


@functools.partial(
    jax.jit, static_argnames=("scale", "bs", "interpret", "stub")
)
def quantized_kv_decode_attention_bdq(
    q: jnp.ndarray,        # [B, Hkv, G, Dh] bf16 — decode (T=1)
    k_q: jnp.ndarray,      # [(L,) B, Hkv·Dh, S] int8 — D-major flat K
    k_scale: jnp.ndarray,  # [(L,) B, Hkv, S]
    v_q: jnp.ndarray,      # [(L,) B, S, Hkv·Dh] int8 — S-major flat V
    v_scale: jnp.ndarray,  # [(L,) B, Hkv, S]
    pos: jnp.ndarray,      # scalar or [B] int32
    *,
    scale: Optional[float] = None,
    bs: int = 1024,
    interpret: bool = False,
    layer_idx=None,
    stub: bool = False,  # CEILING PROBE ONLY: same streams, wrong math
) -> jnp.ndarray:
    """Block-diagonal-Q flash decode on the split flat cache (see
    ``_kernel_bdq``). Returns [B, Hkv, G, Dh] f32. Decode-only (T=1);
    prefill keeps the head-major kernels (it is MXU-bound, not
    cache-streaming-bound).

    With ``layer_idx`` (traced int32), the cache arrays are STACKED
    ([L, ...]) and the kernel indexes the layer in its BlockSpecs — no
    per-layer slice materialization under ``lax.scan`` (a sliced
    operand cannot fuse into a Pallas call; profiled as a full cache
    copy per layer per decode step)."""
    B, H, G, Dh = q.shape
    if layer_idx is None:
        k_q, k_scale, v_q, v_scale = (
            a[None] for a in (k_q, k_scale, v_q, v_scale)
        )
        layer_idx = 0
    S = v_q.shape[2]
    int4 = k_q.dtype == jnp.uint8  # packed 2-per-byte within heads
    hd = H * Dh // (2 if int4 else 1)
    assert k_q.shape[1:] == (B, hd, S), (k_q.shape, H, Dh, S, int4)
    assert v_q.shape[-1] == hd, (v_q.shape, H, Dh, int4)
    if scale is None:
        scale = 1.0 / math.sqrt(Dh)
    bs = min(bs, S)
    while S % bs:
        bs //= 2
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    # tiny head dims: the int8 kernel's band-extraction reshape
    # [HG, H·Dh] → [HG, H, Dh] needs a ≥128 minor dim on Mosaic
    # ("unsupported shape cast" at Dh=32, found by the serving --small
    # TPU smoke). On real TPU callers should route to the head-major
    # kernel instead (see ``bdq_compiled_supported`` — model.py does);
    # a direct call still works but falls back to interpret mode, with
    # a loud warning since that is orders of magnitude slower.
    if Dh < 128 and not interpret:
        import warnings

        warnings.warn(
            "quantized_kv_decode_attention_bdq: head_dim "
            f"{Dh} < 128 has no compiled Mosaic route; running in "
            "interpret mode (very slow). Use "
            "quantized_kv_decode_attention (head-major) instead.",
            stacklevel=2,
        )
        interpret = True
    n_s = S // bs

    # block-diagonal Q (tiny: B·HG·HDh bf16), built once per step in XLA
    eye = jnp.eye(H, dtype=q.dtype)
    qbd = jnp.einsum("bhgd,hk->bhgkd", q, eye).reshape(
        B, H * G, H * Dh
    )

    cache_specs = [
        pl.BlockSpec((1, 1, hd, bs), lambda b, s, l, p: (l[0], b, 0, s)),
        pl.BlockSpec((1, 1, H, bs), lambda b, s, l, p: (l[0], b, 0, s)),
        pl.BlockSpec((1, 1, bs, hd), lambda b, s, l, p: (l[0], b, s, 0)),
        pl.BlockSpec((1, 1, H, bs), lambda b, s, l, p: (l[0], b, 0, s)),
    ]
    scratch = [
        pltpu.VMEM((H * G, 1), jnp.float32),
        pltpu.VMEM((H * G, 1), jnp.float32),
        pltpu.VMEM((H * G, Dh), jnp.float32),
    ]
    pos_vec = jnp.broadcast_to(
        jnp.atleast_1d(pos).astype(jnp.int32), (B,)
    )
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))

    if int4:
        # split Qbd into each head's lo / hi Dh halves (matches the
        # within-head 2-per-byte packing)
        q4 = qbd.reshape(B, H * G, H, 2, Dh // 2)
        qlo = q4[:, :, :, 0, :].reshape(B, H * G, hd)
        qhi = q4[:, :, :, 1, :].reshape(B, H * G, hd)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_s),
            in_specs=[
                pl.BlockSpec(
                    (1, H * G, hd), lambda b, s, l, p: (b, 0, 0)
                ),
                pl.BlockSpec(
                    (1, H * G, hd), lambda b, s, l, p: (b, 0, 0)
                ),
            ] + cache_specs,
            out_specs=pl.BlockSpec(
                (1, H * G, Dh), lambda b, s, l, p: (b, 0, 0)
            ),
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _kernel_bdq_i4, bs=bs, scale=scale, n_s_blocks=n_s,
            n_heads=H, dh=Dh, stub=stub,
        )
        out_call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, H * G, Dh), jnp.float32),
            interpret=interpret,
        )
        out = out_call(
            lvec, pos_vec, qlo, qhi, k_q, k_scale, v_q, v_scale
        )
        return out.reshape(B, H, G, Dh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_s),
        in_specs=[
            pl.BlockSpec(
                (1, H * G, H * Dh), lambda b, s, l, p: (b, 0, 0)
            ),
        ] + cache_specs,
        out_specs=pl.BlockSpec(
            (1, H * G, Dh), lambda b, s, l, p: (b, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel_bdq, bs=bs, scale=scale, n_s_blocks=n_s,
        n_heads=H, dh=Dh, stub=stub,
    )
    out_call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H * G, Dh), jnp.float32),
        interpret=interpret,
    )
    out = out_call(lvec, pos_vec, qbd, k_q, k_scale, v_q, v_scale)
    return out.reshape(B, H, G, Dh)


def unpack_int4_kv(p: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """XLA-level unpack of the packed int4 KV layout (byte d holds
    elements d and d + Dh/2 as offset-binary nibbles) — the single
    source of truth for the layout outside the Mosaic kernel (which
    needs its own cast-legal formulation in ``_dequant_kv_block``)."""
    lo = (p & jnp.uint8(0xF)).astype(jnp.int32) - 8
    hi = (p >> 4).astype(jnp.int32) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


def _kernel_heads(
    pos_ref,  # scalar prefetch: [B] int32
    q_ref,    # [1, Hkv, bq, Dh] bf16
    kq_ref,   # [1, Hkv, bs, dh_store] int8/uint8
    ks_ref,   # [1, Hkv, bs, 1] bf16
    vq_ref,   # [1, Hkv, bs, dh_store]
    vs_ref,   # [1, Hkv, bs, 1] bf16
    out_ref,  # [1, Hkv, bq, Dh] f32
    m_ref, l_ref, acc_ref,
    *, bs: int, scale: float, n_s_blocks: int, rows_per_t: int,
    kv_bits: int = 8,
):
    """Head-folded variant: all Hkv heads ride ONE grid step as the
    batch dim of batched dots (probed legal in Mosaic) — 8× fewer grid
    steps than the per-head kernel, which was measured per-grid-step
    overhead-bound (PERF.md: 631 µs / 6.7 GB/s at S=2048). The win is
    long-context decode, where the KV cache read dominates."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[pl.program_id(0)]
    block_start = s * bs
    H, bq = q_ref.shape[1], q_ref.shape[2]
    row0 = pl.program_id(1) * bq
    t_max = (row0 + bq - 1) // rows_per_t

    @pl.when(block_start <= pos + t_max)
    def _():
        q = q_ref[0]                                    # [H, bq, Dh]
        if kv_bits == 8:
            # mixed bf16×s8 batched dot; per-key scale factors out
            raw = jax.lax.dot_general(
                q, kq_ref[0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                           # [H, bq, bs]
            srow = jnp.swapaxes(
                ks_ref[0].astype(jnp.float32), 1, 2
            )                                           # [H, 1, bs]
            scores = raw * srow * scale
        else:
            k = _dequant_kv_block(kq_ref[0], ks_ref[0], kv_bits)
            scores = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                   # [H, bq, bs]

        idx = block_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=2
        )
        row_t = (row0 + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )) // rows_per_t
        scores = jnp.where(idx <= pos + row_t, scores, NEG_INF)

        m_old = m_ref[:]                                # [H, bq, 1]
        m_new = jnp.maximum(
            m_old, jnp.max(scores, axis=2, keepdims=True)
        )
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_old - m_new)

        if kv_bits == 8:
            vrow = jnp.swapaxes(
                vs_ref[0].astype(jnp.float32), 1, 2
            )                                           # [H, 1, bs]
            p2 = (p * vrow).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p2, vq_ref[0], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                           # [H, bq, Dh]
        else:
            v = _dequant_kv_block(vq_ref[0], vs_ref[0], kv_bits)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                           # [H, bq, Dh]

        m_ref[:] = m_new
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(s == n_s_blocks - 1)
    def _():
        out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


def quantized_kv_decode_attention_reference(
    q, k_q, k_scale, v_q, v_scale, pos, scale=None
):
    """jnp oracle: dequantize the whole cache (the reference model's own
    strategy) and run masked softmax attention. Accepts int8 or packed
    int4 KV."""
    B, Hkv, G, Dh = q.shape
    S = k_q.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(Dh)
    if k_q.shape[-1] * 2 == Dh:  # packed int4
        k = unpack_int4_kv(k_q) * k_scale.astype(jnp.float32)
        v = unpack_int4_kv(v_q) * v_scale.astype(jnp.float32)
    else:
        k = k_q.astype(jnp.float32) * k_scale.astype(jnp.float32)
        v = v_q.astype(jnp.float32) * v_scale.astype(jnp.float32)
    scores = jnp.einsum(
        "bhgd,bhsd->bhgs", q.astype(jnp.float32), k
    ) * scale
    pos_vec = jnp.broadcast_to(jnp.atleast_1d(pos), (B,))
    mask = (
        jnp.arange(S)[None, None, None, :]
        <= pos_vec[:, None, None, None]
    )
    scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhgs,bhsd->bhgd", p, v)
