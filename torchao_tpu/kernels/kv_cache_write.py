"""Fused per-slot KV-cache write kernel (split-flat S-major layout).

Serving decode (continuous batching) writes one quantized token per
slot into four stacked cache arrays at per-slot positions. The XLA
formulation that avoids full-cache copies is B chained
``dynamic_update_slice`` ops per array (see
``models/llama/model.py::_smajor_write``) — 4·B tiny sequential ops per
layer-step, profiled at ~1-2 µs each (~4-5 ms of a 16.3 ms B=8 step
across 32 layers; ROADMAP round-3 item 2).

This kernel replaces all 4·B writes with ONE Pallas call per
layer-step: grid over slots, scalar-prefetched positions drive banded
output BlockSpecs ((sublane, lane)-legal read-modify-write windows
around each slot's write position), and ``input_output_aliases`` keeps
the cache in place. Extra traffic is the banded windows only
(~128 KB·B per layer vs the 67 MB full-cache copies the scatter forms
caused).

Reference behavior parity: the reference's ``AffineQuantizedKVCache``
(torchao/_models/llama/model.py:198-231) quantizes per token and
``index_copy_``s into static caches; this is the TPU-native equivalent
for the serving engine's vector positions.

Layouts written (see ``init_kv_cache``):
  k_q     [L, B, X, S]   int8/uint8 — D-major: token = column ``pos``
  v_q     [L, B, S, X]   int8/uint8 — S-major: token = row ``pos``
  k_scale [L, B, Hkv, S] bf16/f32   — column ``pos``
  v_scale [L, B, Hkv, S] bf16/f32   — column ``pos``

Mosaic legality notes (probed on this hw, docs/developer_guide.md §4):
- i8→i32 widen and i32→i8 store-cast are legal; u8 goes via i16.
- [1, X] → [X, 1] vector transpose (lane→sublane) is done at 32 bit.
- masks are arithmetic 0/1 i32 (i1 vectors trip "invalid relayout").
- positions may be CLAMPED at the grid edge like dynamic_update_slice
  (index maps clamp OOB block indices) — callers guarantee in-bounds
  positions (the serving engine's overshoot invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8


def _widen(x):
    """int8/uint8 → int32 via the probed-legal cast chain."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int16).astype(jnp.int32)
    if x.dtype == jnp.int8:
        return x.astype(jnp.int32)
    return x.astype(jnp.float32)


def _kernel(
    sp_ref,       # [2 + B] int32 SMEM: [layer, S, pos_0, ..., pos_{B-1}]
    kf_ref,       # [B, X] i8/u8 — new K token, D-major content
    vf_ref,       # [B, X] i8/u8 — new V token
    ks_ref,       # [B, Hkv] f32 — new K scales
    vs_ref,       # [B, Hkv] f32 — new V scales
    kqi_ref, vqi_ref, ksi_ref, vsi_ref,      # aliased cache windows in
    kqo_ref, vqo_ref, kso_ref, vso_ref,      # cache windows out
):
    b = pl.program_id(0)
    # clamp like dynamic_update_slice (sp_ref[1] carries S)
    p = jnp.minimum(sp_ref[2 + b], sp_ref[1] - 1)
    lane = p % _LANE
    srow = p % _SUB

    i32 = jnp.int32

    def lane_mask(width, idx):
        d = jax.lax.broadcasted_iota(i32, (1, width), 1) - idx
        return 1 - jnp.minimum(d * d, 1)                  # [1, width] 0/1

    def sub_mask(height, idx):
        d = jax.lax.broadcasted_iota(i32, (height, 1), 0) - idx
        return 1 - jnp.minimum(d * d, 1)                  # [height, 1]

    def pick_row(ref):
        """Row ``b`` of a full-block [B, W] input as [1, W] i32/f32 —
        dynamic 1-row sublane loads need 8-multiple indices on Mosaic,
        so select with a 0/1 sublane mask + sum instead."""
        full = _widen(ref[:, :])                          # [B, W]
        msel = sub_mask(full.shape[0], b).astype(full.dtype)
        return jnp.sum(full * msel, axis=0, keepdims=True)

    # ---- K values: column `lane` of the [X, 128] band -------------------
    old = _widen(kqi_ref[0, 0])                           # [X, 128] i32
    row = pick_row(kf_ref)                                # [1, X] i32
    col = row.reshape(row.shape[1], 1)                    # [X, 1] (32-bit)
    m = lane_mask(_LANE, lane)
    kqo_ref[0, 0] = (old * (1 - m) + col * m).astype(kqo_ref.dtype)

    # ---- V values: row `srow` of the [8, X] band -------------------------
    old = _widen(vqi_ref[0, 0])                           # [8, X] i32
    vrow = pick_row(vf_ref)                               # [1, X] i32
    ms = sub_mask(_SUB, srow)
    vqo_ref[0, 0] = (old * (1 - ms) + vrow * ms).astype(vqo_ref.dtype)

    # ---- scales: column `lane` of the [Hkv, 128] bands -------------------
    mf = lane_mask(_LANE, lane).astype(jnp.float32)
    for s_ref, i_ref, o_ref in (
        (ks_ref, ksi_ref, kso_ref),
        (vs_ref, vsi_ref, vso_ref),
    ):
        olds = i_ref[0, 0].astype(jnp.float32)            # [Hkv, 128]
        srow_v = pick_row(s_ref)                          # [1, Hkv] f32
        scol = srow_v.reshape(srow_v.shape[1], 1)         # [Hkv, 1]
        o_ref[0, 0] = (olds * (1.0 - mf) + scol * mf).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_smajor_token_write(
    k_q, v_q, k_scale, v_scale,   # stacked caches [L, B, ...]
    kf, vf,                       # [B, X] quantized new token (i8/u8)
    ks, vs,                       # [B, Hkv] new scales
    pos,                          # [B] int32 per-slot positions
    layer_idx,                    # traced int32 scalar
    *,
    interpret: bool = False,
):
    """One-call per-slot token write into all four stacked cache arrays.

    Returns the four updated caches (aliased in place on TPU)."""
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    L, B, X, S = k_q.shape
    Hkv = k_scale.shape[2]
    sp = jnp.concatenate(
        [jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32)),
         jnp.full((1,), S, jnp.int32),
         pos.astype(jnp.int32)]
    )

    def kq_map(b, sp):
        return (sp[0], b, 0, jnp.minimum(sp[2 + b], sp[1] - 1) // _LANE)

    def vq_map(b, sp):
        return (sp[0], b, jnp.minimum(sp[2 + b], sp[1] - 1) // _SUB, 0)

    def sc_map(b, sp):
        return (sp[0], b, 0, jnp.minimum(sp[2 + b], sp[1] - 1) // _LANE)

    kq_spec = pl.BlockSpec((1, 1, X, _LANE), kq_map)
    vq_spec = pl.BlockSpec((1, 1, _SUB, X), vq_map)
    sc_spec = pl.BlockSpec((1, 1, Hkv, _LANE), sc_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, X), lambda b, sp: (0, 0)),
            pl.BlockSpec((B, X), lambda b, sp: (0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, sp: (0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, sp: (0, 0)),
            kq_spec, vq_spec, sc_spec, sc_spec,
        ],
        out_specs=[kq_spec, vq_spec, sc_spec, sc_spec],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_q.shape, k_q.dtype),
            jax.ShapeDtypeStruct(v_q.shape, v_q.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # inputs 5-8 (after the prefetch operand) are the caches;
        # alias them onto outputs 0-3 so the update is in place
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(sp, kf, vf, ks.astype(jnp.float32), vs.astype(jnp.float32),
      k_q, v_q, k_scale, v_scale)


def fused_write_available(layer_cache, k, input_pos, l) -> bool:
    """Dispatch gate: stacked split-flat cache, vector positions, T=1,
    TPU backend, shapes lane/sublane-compatible."""
    import os

    if os.environ.get("TORCHAO_TPU_DISABLE_FUSED_KV_WRITE") == "1":
        return False
    if l is None or getattr(input_pos, "ndim", 0) != 1:
        return False
    if k.shape[2] != 1:                     # T == 1 only
        return False
    if (
        jax.default_backend() not in ("tpu", "axon")
        and os.environ.get("TORCHAO_TPU_FUSED_KV_WRITE") != "interpret"
    ):
        return False
    k_q = layer_cache.get("k_q")
    if k_q is None or k_q.ndim != 4:
        return False
    L, B, X, S = k_q.shape
    Hkv = layer_cache["k_scale"].shape[2]
    return (
        S % _LANE == 0
        and X % _LANE == 0
        and Hkv % _SUB == 0
        and S >= _LANE
    )
