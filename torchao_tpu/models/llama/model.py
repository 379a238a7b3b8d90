"""gpt-fast-style Llama decoder, TPU-native.

Functional re-design of the reference's ``torchao/_models/llama/model.py``
(``ModelArgs.from_name:54``, ``Transformer:243``, ``KVCache:166``,
``AffineQuantizedKVCache:198``, ``Attention.forward:441``, rotary
``:503-556``) for JAX/XLA:

- params are a pytree with **stacked layer weights** (leading ``n_layer``
  axis) and the forward pass is a single ``lax.scan`` over layers — one
  compiled layer body instead of an unrolled graph (fast compiles, and XLA
  pipelines the per-layer collectives under TP sharding).
- the KV cache is a static-shape pytree carried through the scan as
  per-layer xs/ys; an int8 per-token-absmax quantized variant mirrors
  ``AffineQuantizedKVCache`` exactly (scales ``[B, H, S, 1]``).
- weights may be quantized array pytrees; every matmul goes through
  ``torchao_tpu.ops.linear`` dispatch.

Weight layout is torch-convention ``[out_features, in_features]`` so
quantization block sizes match the reference semantics.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu import ops
from torchao_tpu.qtypes.base import QuantizedArray
from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.utils import find_multiple


@dataclasses.dataclass
class ModelArgs:
    block_size: int = 2048
    vocab_size: int = 32000
    n_layer: int = 32
    n_head: int = 32
    dim: int = 4096
    intermediate_size: Optional[int] = None
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000
    norm_eps: float = 1e-5
    use_scaled_rope: bool = False
    tie_word_embeddings: bool = False
    # SpinQuant R4: online Hadamard on the SwiGLU gate output before w2
    # (w2 must have been folded by prototype.spinquant.apply_spinquant
    # with r4=True — see that module's docstring).
    use_r4_hadamard: bool = False
    # >1: the fused wqkv out-features are interleaved device-major for
    # aligned tensor parallelism (parallel.sharding.interleave_qkv_params)
    # and the q/k/v split is per-block — see _attention
    qkv_device_blocks: int = 1
    # >1: the merged w13 out-features are interleaved device-major
    # ([w1_d | w3_d] per block — parallel.sharding.interleave_w13_params)
    # and the gate/up split is per-block — see _feed_forward
    ffn_device_blocks: int = 1
    # SpinQuant R3: online per-head Hadamard on q and k after RoPE.
    # Score-invariant ((qH)(kH)ᵀ = qkᵀ), so it needs no weight folding;
    # its purpose is flattening K's per-token distribution before the
    # quantized KV cache (int8/int4) quantizes it.
    use_r3_hadamard: bool = False
    # Manual tensor parallelism (shard_map): set on the LOCAL ModelArgs
    # by parallel.tp.tp_local_args — the forward then runs on per-device
    # shard shapes and inserts the canonical Megatron collectives itself
    # (psum after the row-parallel wo/w2, vocab all-gather after the
    # column-parallel head). Required for the Pallas-kernel TP path:
    # Mosaic custom calls cannot be auto-partitioned by GSPMD, so
    # multi-chip TPU decode wraps the forward in shard_map
    # (parallel/tp.py) instead of relying on sharding propagation.
    tp_axis: Optional[str] = None

    def __post_init__(self):
        if self.n_local_heads == -1:
            self.n_local_heads = self.n_head
        if self.intermediate_size is None:
            hidden_dim = 4 * self.dim
            n_hidden = int(2 * hidden_dim / 3)
            self.intermediate_size = find_multiple(n_hidden, 256)
        self.head_dim = self.dim // self.n_head

    @classmethod
    def from_name(cls, name: str):
        if name in transformer_configs:
            return cls(**transformer_configs[name])
        matches = [
            c for c in transformer_configs
            if c in str(name).upper() or c in str(name)
        ]
        matches.sort(key=len, reverse=True)
        assert matches, f"Unknown model {name}"
        return cls(**transformer_configs[matches[0]])


# Architecture hyperparameters (facts from the reference's
# transformer_configs table, model.py:75-158), plus a tiny debug config.
transformer_configs = {
    "tiny-debug": dict(
        block_size=256, vocab_size=512, n_layer=2, n_head=4,
        n_local_heads=2, dim=128, intermediate_size=256, rope_base=10000,
    ),
    "stories15M": dict(n_layer=6, n_head=6, dim=288),
    "stories110M": dict(n_layer=12, n_head=12, dim=768),
    "7B": dict(n_layer=32, n_head=32, dim=4096),
    "13B": dict(n_layer=40, n_head=40, dim=5120),
    "30B": dict(n_layer=60, n_head=52, dim=6656),
    "70B": dict(
        n_layer=80, n_head=64, dim=8192, n_local_heads=8,
        intermediate_size=28672,
    ),
    "Mistral-7B": dict(
        n_layer=32, n_head=32, n_local_heads=8, dim=4096,
        intermediate_size=14336, vocab_size=32000,
    ),
    "Llama-3-8B": dict(
        block_size=8192, n_layer=32, n_head=32, n_local_heads=8, dim=4096,
        intermediate_size=14336, vocab_size=128256, rope_base=500000,
    ),
    "Llama-3.1-8B": dict(
        block_size=131072, n_layer=32, n_head=32, n_local_heads=8, dim=4096,
        intermediate_size=14336, vocab_size=128256, rope_base=500000,
        use_scaled_rope=True,
    ),
    "Llama-3.1-70B": dict(
        block_size=131072, n_layer=80, n_head=64, n_local_heads=8, dim=8192,
        intermediate_size=28672, vocab_size=128256, rope_base=500000,
        use_scaled_rope=True,
    ),
    "Llama-3.1-405B": dict(
        block_size=131072, n_layer=126, n_head=128, n_local_heads=8,
        dim=16384, intermediate_size=53248, vocab_size=128256,
        rope_base=500000, use_scaled_rope=True,
    ),
    "Llama-3.2-3B": dict(
        block_size=131072, n_layer=28, n_head=24, n_local_heads=8, dim=3072,
        intermediate_size=8192, vocab_size=128256, rope_base=500000,
        use_scaled_rope=True, tie_word_embeddings=True,
    ),
}


# ---------------------------------------------------------------------------
# rotary embeddings (reference model.py:503-556)
# ---------------------------------------------------------------------------


def _apply_rope_scaling(freqs: np.ndarray) -> np.ndarray:
    """Llama-3.1 rope scaling (reference ``apply_scaling``, model.py:503)."""
    scale_factor = 8
    low_freq_factor = 1
    high_freq_factor = 4
    old_context_len = 8192
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2 * math.pi / freqs
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    scaled = np.where(
        wavelen < high_freq_wavelen,
        freqs,
        np.where(
            wavelen > low_freq_wavelen,
            freqs / scale_factor,
            (1 - smooth) * freqs / scale_factor + smooth * freqs,
        ),
    )
    return scaled


def precompute_freqs_cis(args: ModelArgs, dtype=jnp.float32) -> jnp.ndarray:
    """[block_size, head_dim/2, 2] (cos, sin) table."""
    n_elem = args.head_dim
    freqs = 1.0 / (
        args.rope_base
        ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float64) / n_elem)
    )
    if args.use_scaled_rope:
        freqs = _apply_rope_scaling(freqs)
    t = np.arange(args.block_size)
    angles = np.outer(t, freqs)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype)


def apply_rotary_emb(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, head_dim]; freqs: [T, head_dim/2, 2] (shared) or
    [B, T, head_dim/2, 2] (per-slot positions, continuous batching).

    Pairs adjacent features (reference ``apply_rotary_emb``, model.py:545).
    """
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*x.shape[:-1], -1, 2)
    if freqs.ndim == 4:  # per-batch positions
        cos = freqs[:, :, None, :, 0]
        sin = freqs[:, :, None, :, 1]
    else:
        cos = freqs[None, :, None, :, 0]
        sin = freqs[None, :, None, :, 1]
    out = jnp.stack(
        [
            x2[..., 0] * cos - x2[..., 1] * sin,
            x2[..., 1] * cos + x2[..., 0] * sin,
        ],
        axis=-1,
    )
    return out.reshape(x.shape).astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rms).astype(x.dtype) * weight


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    args: ModelArgs,
    batch_size: int,
    max_seq_len: int,
    dtype=jnp.bfloat16,
    quantize=False,
) -> Dict[str, jnp.ndarray]:
    """Static-shape KV cache pytree with leading layer axis.

    bf16: ``{"k","v": [L, B, Hkv, S, Dh]}`` (reference ``KVCache:166``).
    ``quantize=True``/``"int8"``: per-token-absmax int8 (reference
    ``AffineQuantizedKVCache:198`` semantics) in the split-flat layout
    below; ``"int8_hmajor"`` keeps the reference's head-major memory
    order (scales ``[L, B, Hkv, S, 1]``).
    ``quantize="int4"``: symmetric int4 KV packed 2-per-uint8 along Dh
    (byte d holds elements d and d + Dh/2 as offset-binary nibbles) —
    half the cache bytes of int8; the Pallas attention kernel unpacks
    in VMEM (north-star int4 KV-cache capability; the reference only
    ships int8).

    Long caches round UP to a multiple of 1024 so the flash kernel's
    key blocks stay large: a ragged S (e.g. 8064) would force the
    divisibility loop down to tiny blocks (measured: S=8064 → bs=32 →
    2016 grid steps/layer → attention-bound 22 tok/s at 8k ctx). The
    causal mask never reads the padded tail.
    """
    if max_seq_len > 1024:
        max_seq_len = -(-max_seq_len // 1024) * 1024
    shape = (
        args.n_layer, batch_size, args.n_local_heads, max_seq_len,
        args.head_dim,
    )
    if not quantize:
        return {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
        }
    if quantize in (True, "int8", "int8_smajor", "smajor"):
        # int8 per-token-absmax KV (reference AffineQuantizedKVCache
        # semantics) in the split-flat layout — the DEFAULT int8 layout:
        # measured 100.1 vs ~31 tok/s at 8k ctx against the head-major
        # layout ("int8_hmajor" keeps the reference's [L,B,H,S,Dh]
        # memory order for layout-parity work).
        # Split flat int8 cache: K is D-major [L, B, Hkv·Dh, S], V is
        # S-major [L, B, S, Hkv·Dh], scales [L, B, Hkv, S]. Cache
        # blocks are fat ~1 MB 2-D tiles covering ALL heads — the same
        # memory shape as the 600 GB/s weight kernels instead of thin
        # per-head [bs, Dh] stripes (~50 GB/s at 8k ctx — PERF.md) —
        # and each layout feeds its dot in the MXU-natural orientation
        # (contraction over the rhs MAJOR dim; a uniform S-major cache
        # forced a 1 MB int8 in-VMEM transpose per score block —
        # measured slower end-to-end than per-head). Consumed by
        # ``quantized_kv_decode_attention_bdq``.
        HD = args.n_local_heads * args.head_dim
        L, B, S = args.n_layer, batch_size, max_seq_len
        return {
            "k_q": jnp.zeros((L, B, HD, S), jnp.int8),
            "v_q": jnp.zeros((L, B, S, HD), jnp.int8),
            "k_scale": jnp.zeros((L, B, args.n_local_heads, S), dtype),
            "v_scale": jnp.zeros((L, B, args.n_local_heads, S), dtype),
        }
    if quantize in ("int4_smajor", "int4smajor"):
        # packed int4 on the split-flat fast path: HALF the int8 layout's
        # bytes (2x context per HBM byte) consumed directly by the
        # block-diagonal-Q kernel's int4 variant. Packing is 2-per-byte
        # WITHIN each head along Dh, so head-sharded TP shards whole
        # bytes (parallel/sharding.py kv rules apply unchanged).
        assert args.head_dim % 2 == 0
        HD2 = args.n_local_heads * args.head_dim // 2
        L, B, S = args.n_layer, batch_size, max_seq_len
        return {
            "k_q": jnp.zeros((L, B, HD2, S), jnp.uint8),
            "v_q": jnp.zeros((L, B, S, HD2), jnp.uint8),
            "k_scale": jnp.zeros((L, B, args.n_local_heads, S), dtype),
            "v_scale": jnp.zeros((L, B, args.n_local_heads, S), dtype),
        }
    if quantize == "int4":
        assert args.head_dim % 2 == 0
        pshape = shape[:-1] + (args.head_dim // 2,)
        sshape = shape[:-1] + (1,)
        return {
            "k_q": jnp.zeros(pshape, jnp.uint8),
            "v_q": jnp.zeros(pshape, jnp.uint8),
            "k_scale": jnp.zeros(sshape, dtype),
            "v_scale": jnp.zeros(sshape, dtype),
        }
    assert quantize in ("int8_hmajor", "hmajor"), quantize
    sshape = shape[:-1] + (1,)
    return {
        "k_q": jnp.zeros(shape, jnp.int8),
        "v_q": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(sshape, dtype),
        "v_scale": jnp.zeros(sshape, dtype),
    }


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token absmax int8 over head_dim: x [B, H, T, Dh] →
    (int8 values, scales [B, H, T, 1]). Reference
    ``_quantize_activation_per_token_absmax`` usage in
    ``AffineQuantizedKVCache.update`` (model.py:221-231)."""
    q, scale = qp.quantize_activation_per_token_absmax(x)
    return q, scale[..., None].astype(x.dtype)


def _quantize_kv_int4(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token absmax symmetric int4, packed 2-per-uint8 along Dh:
    byte d = (q[d]+8) | ((q[d+Dh/2]+8) << 4) — the layout the Pallas
    attention kernel unpacks with the XOR-rebias identity."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-5) / 7.0
    q = jnp.clip(jnp.round(xf / s), -8, 7).astype(jnp.int32) + 8
    qu = q.astype(jnp.uint8)
    half = x.shape[-1] // 2
    packed = qu[..., :half] | (qu[..., half:] << 4)
    return packed, s.astype(x.dtype)


def _dequantize_kv_int4(p: jnp.ndarray, s: jnp.ndarray, dtype):
    from torchao_tpu.kernels.quantized_attention import unpack_int4_kv

    return unpack_int4_kv(p, dtype) * s.astype(dtype)


def _kv_is_int4(layer_cache) -> bool:
    return (
        "k_q" in layer_cache and layer_cache["k_q"].dtype == jnp.uint8
    )


def _kv_is_smajor(layer_cache) -> bool:
    """S-major flat int8 layout: per-layer k_q is [B, S, Hkv·Dh]."""
    return "k_q" in layer_cache and layer_cache["k_q"].ndim == 3


def _smajor_write(cache_arr, new_vals, input_pos, axis, l=None):
    """Write new values into a flat cache at ``input_pos`` along
    ``axis`` (1 = S-major rows [B, S, X]; 2 = minor dim of [B, X, S]).
    ``input_pos`` is a shared scalar or per-slot [B] vector. With ``l``
    (traced int32), ``cache_arr`` is the STACKED [L, B, ...] cache and
    the write lands in-place at layer ``l`` (the cache rides the layer
    scan as a carry — no per-layer slice/restack traffic)."""
    new_vals = new_vals.astype(cache_arr.dtype)
    vector = getattr(input_pos, "ndim", 0) == 1
    if vector:
        # single SCATTER: a vmap-of-dynamic_update_slice here lowers to
        # full-cache copy+select (profiled 55% of serving decode — one
        # ~206 us copy of the 67 MB stacked cache per layer-step); the
        # scatter measures 2.2x faster and updates the scan-carried
        # buffer in place. OOB rows are dropped — the engine's overshoot
        # invariant only ever writes at scratch positions anyway.
        B = new_vals.shape[0]
        T = new_vals.shape[1] if axis == 1 else new_vals.shape[2]
        import os

        mode = os.environ.get("TORCHAO_TPU_KV_WRITE")
        if mode != "scatter" and (B <= 32 or mode == "unrolled"):
            # chained per-row dynamic_update_slice — the DEFAULT for
            # serving-sized B: XLA provably aliases chained DUS in place,
            # while the scatter forms leave one full-stacked-cache copy
            # per layer-step in front of the Pallas attention kernel
            # (profiled: 260 us/67 MB; serving 352 -> 491 tok/s agg
            # steady after this switch). B sequential tiny updates
            # trade B-fold op count for zero copies; very large B falls
            # back to one scatter.
            out = cache_arr
            for b in range(B):
                nv = new_vals[b]  # [T, X] (axis=1) or [X, T] (axis=2)
                if axis == 1:
                    start = (b, input_pos[b], 0)
                else:
                    start = (b, 0, input_pos[b])
                blk = nv[None]
                if l is not None:
                    start = (l,) + start
                    blk = blk[None]
                out = jax.lax.dynamic_update_slice(out, blk, start)
            return out
        b_idx = jnp.arange(B)[:, None]                     # [B, 1]
        s_idx = input_pos[:, None] + jnp.arange(T)[None]   # [B, T]
        upd = new_vals if axis == 1 else new_vals.transpose(0, 2, 1)
        if axis == 1:
            if l is None:
                return cache_arr.at[b_idx, s_idx, :].set(
                    upd, mode="drop", unique_indices=True
                )
            return cache_arr.at[l, b_idx, s_idx, :].set(
                upd, mode="drop", unique_indices=True
            )
        # axis == 2 (minor-dim column writes, e.g. D-major K): the
        # ``.at[l, b, :, s]`` form has SEPARATED advanced indices, which
        # lowers through an operand transpose — the scatter result then
        # carries a non-default layout and XLA inserts a full-cache
        # layout-fixup copy in front of the Pallas attention kernel
        # (profiled: 260 us per 67 MB per layer-step). A manual windowed
        # lax.scatter (window on the X dim) keeps the default layout.
        flat_idx = (b_idx + jnp.zeros_like(s_idx)).reshape(-1)   # [B*T]
        flat_s = s_idx.reshape(-1)                               # [B*T]
        upd_flat = upd.reshape(B * T, upd.shape[-1])             # [B*T, X]
        if l is None:
            idx = jnp.stack([flat_idx, flat_s], axis=1)          # [BT, 2]
            dn = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0, 2),
                scatter_dims_to_operand_dims=(0, 2),
            )
        else:
            lcol = jnp.full((B * T, 1), l, jnp.int32)
            idx = jnp.concatenate(
                [lcol, flat_idx[:, None], flat_s[:, None]], axis=1
            )                                                    # [BT, 3]
            dn = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0, 1, 3),
                scatter_dims_to_operand_dims=(0, 1, 3),
            )
        return jax.lax.scatter(
            cache_arr, idx, upd_flat, dn,
            indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )
    if l is None:
        start = (0, input_pos, 0) if axis == 1 else (0, 0, input_pos)
        return jax.lax.dynamic_update_slice(cache_arr, new_vals, start)
    start = (
        (l, 0, input_pos, 0) if axis == 1 else (l, 0, 0, input_pos)
    )
    return jax.lax.dynamic_update_slice(cache_arr, new_vals[None], start)


def _smajor_update(layer_cache, k, v, input_pos, l=None):
    """Quantize new k/v ([B, Hkv, T, Dh]) per token and write them into
    the split flat cache (K D-major, V S-major — see ``init_kv_cache``).
    A uint8 cache means packed int4 (2-per-byte within heads) — half
    the bytes through the same write path. Returns the updated cache
    pytree (stacked in-place when ``l`` is given)."""
    B, Hkv, T, Dh = k.shape
    if layer_cache["k_q"].dtype == jnp.uint8:
        k_q, k_s = _quantize_kv_int4(k)   # [B, Hkv, T, Dh/2] u8
        v_q, v_s = _quantize_kv_int4(v)
        Dh = Dh // 2
    else:
        k_q, k_s = _quantize_kv(k)
        v_q, v_s = _quantize_kv(v)

    from torchao_tpu.kernels.kv_cache_write import (
        fused_smajor_token_write,
        fused_write_available,
    )

    # scalar positions (single-stream decode) ride the same fused write
    # as a broadcast vector: the round-4 8k profile found the scalar
    # k_q/v_q DUS into the scan-carried stacked cache materializing TWO
    # full cache-slab copies per layer-step in front of the Pallas
    # attention kernel (~0.5 ms/step at S=8k — invisible at short ctx).
    pos_fused = (
        input_pos if getattr(input_pos, "ndim", 0) == 1
        else jnp.full((B,), input_pos, jnp.int32)
    )
    if fused_write_available(layer_cache, k, pos_fused, l):
        # decode (T=1): ONE Pallas call per layer-step replaces 4·B
        # chained DUS ops (banded in-place RMW windows at each slot's
        # position — ROADMAP round-3 item 2)
        X = Hkv * Dh
        kq, vq, ksc, vsc = fused_smajor_token_write(
            layer_cache["k_q"], layer_cache["v_q"],
            layer_cache["k_scale"], layer_cache["v_scale"],
            k_q.reshape(B, X), v_q.reshape(B, X),
            k_s.reshape(B, Hkv), v_s.reshape(B, Hkv),
            pos_fused, l,
        )
        return {"k_q": kq, "v_q": vq, "k_scale": ksc, "v_scale": vsc}

    # K: [B, Hkv, T, Dh'] → D-major columns [B, Hkv·Dh', T]
    k_flat = k_q.transpose(0, 1, 3, 2).reshape(B, Hkv * Dh, T)
    # V: → S-major rows [B, T, Hkv·Dh']
    v_flat = v_q.transpose(0, 2, 1, 3).reshape(B, T, Hkv * Dh)

    return {
        "k_q": _smajor_write(layer_cache["k_q"], k_flat, input_pos, 2, l),
        "v_q": _smajor_write(layer_cache["v_q"], v_flat, input_pos, 1, l),
        "k_scale": _smajor_write(
            layer_cache["k_scale"], k_s[..., 0], input_pos, 2, l
        ),
        "v_scale": _smajor_write(
            layer_cache["v_scale"], v_s[..., 0], input_pos, 2, l
        ),
    }


def _smajor_to_hmajor(layer_cache, Hkv, Dh, l=None):
    """View the split flat cache head-major ([B, Hkv, S, Dh'] int8 — or
    packed-int4 uint8 with Dh' = Dh/2 — + [B, Hkv, S, 1] scales) — an
    XLA transpose (plus a layer slice when stacked), used on the
    non-decode paths (prefill is MXU-bound, not cache-streaming-bound).
    The head-major packed-int4 layout matches what
    ``quantized_kv_decode_attention`` already consumes."""
    kq, ks, vq, vs = (
        layer_cache["k_q"], layer_cache["k_scale"],
        layer_cache["v_q"], layer_cache["v_scale"],
    )
    if l is not None:
        kq, ks, vq, vs = kq[l], ks[l], vq[l], vs[l]
    B, S, _ = vq.shape
    if kq.dtype == jnp.uint8:
        Dh = Dh // 2

    return (
        kq.reshape(B, Hkv, Dh, S).transpose(0, 1, 3, 2),
        ks[..., None],
        vq.reshape(B, S, Hkv, Dh).transpose(0, 2, 1, 3),
        vs[..., None],
    )


def _cache_write(cache_arr, new_vals, input_pos):
    """Write [B, H, T, *] new values into [B, H, S, *] cache at
    ``input_pos`` — a shared scalar or a per-slot [B] vector (continuous
    batching). Vector positions use one scatter (vmap-of-DUS lowers to
    full-cache copies — see ``_smajor_write``)."""
    new_vals = new_vals.astype(cache_arr.dtype)
    if getattr(input_pos, "ndim", 0) == 1:
        B, H, T = new_vals.shape[:3]
        if B <= 32:
            # chained per-row DUS aliases in place (see _smajor_write)
            out = cache_arr
            for b in range(B):
                out = jax.lax.dynamic_update_slice(
                    out, new_vals[b][None], (b, 0, input_pos[b], 0)
                )
            return out
        b_idx = jnp.arange(B)[:, None]                     # [B, 1]
        s_idx = input_pos[:, None] + jnp.arange(T)[None]   # [B, T]
        return cache_arr.at[b_idx, :, s_idx, :].set(
            new_vals.swapaxes(1, 2), mode="drop", unique_indices=True
        )
    return jax.lax.dynamic_update_slice(
        cache_arr, new_vals, (0, 0, input_pos, 0)
    )


def _update_layer_cache(
    layer_cache: Dict[str, jnp.ndarray],
    k: jnp.ndarray,
    v: jnp.ndarray,
    input_pos: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Write new k/v ([B, Hkv, T, Dh]) at ``input_pos`` and return the full
    (dequantized) cache plus the updated cache pytree."""
    if "k" in layer_cache:
        k_cache = _cache_write(layer_cache["k"], k, input_pos)
        v_cache = _cache_write(layer_cache["v"], v, input_pos)
        return k_cache, v_cache, {"k": k_cache, "v": v_cache}

    qfn = _quantize_kv_int4 if _kv_is_int4(layer_cache) else _quantize_kv
    k_q, k_s = qfn(k)
    v_q, v_s = qfn(v)
    new = {
        "k_q": _cache_write(layer_cache["k_q"], k_q, input_pos),
        "v_q": _cache_write(layer_cache["v_q"], v_q, input_pos),
        "k_scale": _cache_write(layer_cache["k_scale"], k_s, input_pos),
        "v_scale": _cache_write(layer_cache["v_scale"], v_s, input_pos),
    }
    # XLA path dequantizes the whole cache (like the reference,
    # model.py:228-231); the Pallas attention kernel consumes the int
    # values + scales directly instead.
    if _kv_is_int4(layer_cache):
        k_full = _dequantize_kv_int4(new["k_q"], new["k_scale"], k.dtype)
        v_full = _dequantize_kv_int4(new["v_q"], new["v_scale"], v.dtype)
    else:
        k_full = new["k_q"].astype(k.dtype) * new["k_scale"].astype(k.dtype)
        v_full = new["v_q"].astype(v.dtype) * new["v_scale"].astype(v.dtype)
    return k_full, v_full, new


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------


def _pallas_attention_enabled() -> bool:
    import os

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_ATTN") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _layer_weight(w):
    """Fix static metadata on a per-layer slice of a stacked quantized
    weight: ``lax.scan`` slices the array leaves (dropping the layer axis)
    but aux data still describes the stacked array."""
    if isinstance(w, QuantizedArray):
        return w.unstack_layer()
    return w


def _lin(x, w, layer_idx):
    """Layer-aware quantized linear: with ``layer_idx`` the STACKED
    weight goes straight to ``ops.linear`` so Pallas kernels index the
    layer in their BlockSpecs (zero-copy under ``lax.scan``; a
    materialized per-layer slice cannot fuse into a custom call and
    costs a full weight copy per decode step — profiled ~40%/step)."""
    if layer_idx is None:
        return ops.linear(x, _layer_weight(w))
    return ops.linear(x, w, layer_idx=layer_idx)


def _row_parallel_out(out, args):
    """Manual-TP partial-sum reduction after a row-parallel linear
    (wo / w2): each shard holds K/m input features, so shard outputs are
    partial sums — one psum per block, the canonical Megatron count."""
    if args.tp_axis is not None:
        out = jax.lax.psum(out, args.tp_axis)
    return out


def _attention(
    x: jnp.ndarray,
    lw: Dict[str, Any],
    freqs: jnp.ndarray,
    mask: jnp.ndarray,
    layer_cache,
    input_pos,
    args: ModelArgs,
    layer_idx=None,
    stacked_cache: bool = False,
):
    """One attention block (reference ``Attention.forward``, model.py:441):
    fused wqkv → RoPE → cache update → GQA SDPA → wo. With
    ``layer_idx``, ``lw`` holds STACKED weights (see ``_lin``); with
    ``stacked_cache``, ``layer_cache`` is the FULL stacked cache carried
    through the layer scan and both the update and the attention kernel
    address layer ``layer_idx`` in place (zero slice/restack traffic)."""
    B, T, D = x.shape
    H, Hkv, Dh = args.n_head, args.n_local_heads, args.head_dim

    qkv = _lin(x, lw["wqkv"], layer_idx)
    if args.qkv_device_blocks > 1:
        # TP-aligned fused projection: wqkv rows were interleaved
        # device-major ([q_d | k_d | v_d] per device block — see
        # parallel.sharding.interleave_qkv_params), so the split is
        # per-block and every slice is shard-local under GSPMD (the
        # naive section split crosses shard boundaries and compiles to
        # per-step weight all-to-alls + activation permutes). Block d
        # holds ORIGINAL head ranges, so concatenation order — and
        # therefore cache layout and wo — is unchanged.
        nb = args.qkv_device_blocks
        qd, kd = H * Dh // nb, Hkv * Dh // nb
        qkv4 = qkv.reshape(B, T, nb, qd + 2 * kd)
        q = qkv4[..., :qd].reshape(B, T, H * Dh)
        k = qkv4[..., qd:qd + kd].reshape(B, T, Hkv * Dh)
        v = qkv4[..., qd + kd:].reshape(B, T, Hkv * Dh)
    else:
        q, k, v = jnp.split(
            qkv, [H * Dh, H * Dh + Hkv * Dh], axis=-1
        )
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, Hkv, Dh)
    v = v.reshape(B, T, Hkv, Dh)

    q = apply_rotary_emb(q, freqs)
    k = apply_rotary_emb(k, freqs)

    # [B, H*, T, Dh]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if args.use_r3_hadamard:
        # SpinQuant R3: orthonormal per-head rotation of q/k — attention
        # scores are unchanged, but K reaching the quantized KV cache is
        # outlier-flattened (better int8/int4 per-token quantization)
        from torchao_tpu.prototype.spinquant.hadamard_utils import (
            apply_hadamard,
        )

        q = apply_hadamard(q)
        k = apply_hadamard(k)

    if layer_cache is not None and (
        stacked_cache or _kv_is_smajor(layer_cache)
    ):
        # S-major flat cache: decode rides the block-diagonal-Q kernel
        # (fat [bs, Hkv·Dh] cache blocks — the weight-kernel memory
        # shape); prefill transposes to head-major (MXU-bound anyway).
        lidx = layer_idx if stacked_cache else None
        new_cache = _smajor_update(layer_cache, k, v, input_pos, l=lidx)
        g = H // Hkv
        pos_vec = (
            input_pos if getattr(input_pos, "ndim", 0) == 1
            else jnp.full((B,), input_pos, jnp.int32)
        )
        from torchao_tpu.kernels.quantized_attention import (
            bdq_compiled_supported,
        )

        # Sub-128 head dims have no compiled bdq route on Mosaic —
        # keep a compiled path by falling through to the head-major
        # kernel instead of silently interpreting (ADVICE r4 medium).
        use_bdq = bdq_compiled_supported(Dh) or jax.default_backend() not in (
            "tpu",
            "axon",
        )
        if T == 1 and _pallas_attention_enabled() and use_bdq:
            from torchao_tpu.kernels.quantized_attention import (
                quantized_kv_decode_attention_bdq,
            )

            import os as _os

            attn = quantized_kv_decode_attention_bdq(
                q.reshape(B, Hkv, g, Dh),
                new_cache["k_q"], new_cache["k_scale"],
                new_cache["v_q"], new_cache["v_scale"],
                pos_vec,
                bs=int(_os.environ.get("TORCHAO_TPU_ATTN_BS", "1024")),
                layer_idx=lidx,
            )  # [B, Hkv, g, Dh] f32
            out = attn.reshape(B, 1, H * Dh).astype(x.dtype)
            out = _row_parallel_out(_lin(out, lw["wo"], layer_idx), args)
            return out, new_cache
        kq_h, ks_h, vq_h, vs_h = _smajor_to_hmajor(
            new_cache, Hkv, Dh, l=lidx
        )
        if _pallas_attention_enabled():
            from torchao_tpu.kernels.quantized_attention import (
                quantized_kv_decode_attention,
            )

            qg = (
                q.reshape(B, Hkv, g, T, Dh)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, Hkv, T * g, Dh)
            )
            attn = quantized_kv_decode_attention(
                qg, kq_h, ks_h, vq_h, vs_h, pos_vec,
                rows_per_t=g, bq=None if T == 1 else 512,
            )
            out = (
                attn.reshape(B, Hkv, T, g, Dh)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B, T, H * Dh)
                .astype(x.dtype)
            )
            out = _row_parallel_out(_lin(out, lw["wo"], layer_idx), args)
            return out, new_cache
        # XLA fallback (CPU): dequantize like the reference KV cache
        if kq_h.dtype == jnp.uint8:  # packed int4
            k_full = _dequantize_kv_int4(kq_h, ks_h, k.dtype)
            v_full = _dequantize_kv_int4(vq_h, vs_h, v.dtype)
        else:
            k_full = kq_h.astype(k.dtype) * ks_h.astype(k.dtype)
            v_full = vq_h.astype(v.dtype) * vs_h.astype(v.dtype)
    elif layer_cache is not None:
        # quantized cache on TPU → Pallas flash kernel consuming int8 KV
        # directly (no bf16 cache materialization), for both decode (T=1)
        # and prefill (T>1, per-row causal masking)
        if "k_q" in layer_cache and _pallas_attention_enabled():
            from torchao_tpu.kernels.quantized_attention import (
                quantized_kv_decode_attention,
            )

            qfn = (
                _quantize_kv_int4 if _kv_is_int4(layer_cache)
                else _quantize_kv
            )
            k_qv, k_s = qfn(k)
            v_qv, v_s = qfn(v)
            new_cache = {
                "k_q": _cache_write(layer_cache["k_q"], k_qv, input_pos),
                "v_q": _cache_write(layer_cache["v_q"], v_qv, input_pos),
                "k_scale": _cache_write(
                    layer_cache["k_scale"], k_s, input_pos
                ),
                "v_scale": _cache_write(
                    layer_cache["v_scale"], v_s, input_pos
                ),
            }
            g = H // Hkv
            # rows t-major: [B, H, T, Dh] → [B, Hkv, T·g, Dh]
            qg = (
                q.reshape(B, Hkv, g, T, Dh)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, Hkv, T * g, Dh)
            )
            pos_vec = (
                input_pos if getattr(input_pos, "ndim", 0) == 1
                else jnp.full((B,), input_pos, jnp.int32)
            )
            attn = quantized_kv_decode_attention(
                qg,
                new_cache["k_q"], new_cache["k_scale"],
                new_cache["v_q"], new_cache["v_scale"],
                pos_vec,
                rows_per_t=g,
                # prefill (T>1): flash-tile over query rows too, so long
                # prompts never materialize [T·g, S] scores in VMEM
                bq=None if T == 1 else 512,
            )  # [B, Hkv, T·g, Dh] f32
            out = (
                attn.reshape(B, Hkv, T, g, Dh)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B, T, H * Dh)
                .astype(x.dtype)
            )
            out = _row_parallel_out(_lin(out, lw["wo"], layer_idx), args)
            return out, new_cache
        k_full, v_full, new_cache = _update_layer_cache(
            layer_cache, k, v, input_pos
        )
    else:
        k_full, v_full, new_cache = k, v, None

    S = k_full.shape[2]
    g = H // Hkv
    qg = q.reshape(B, Hkv, g, T, Dh)
    scores = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, k_full,
        preferred_element_type=jnp.float32,
    ) / math.sqrt(Dh)
    if mask.ndim == 3:  # per-slot mask [B, T, S]
        scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    else:
        scores = jnp.where(mask[None, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bhsd->bhgtd", probs.astype(v_full.dtype), v_full,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # H·Dh, not D: under manual TP (tp_axis) the local head count makes
    # the attention output narrower than the (global) model dim
    out = out.reshape(B, H, T, Dh).transpose(0, 2, 1, 3).reshape(
        B, T, H * Dh
    )
    out = _row_parallel_out(_lin(out, lw["wo"], layer_idx), args)
    return out, new_cache


def _feed_forward(
    x: jnp.ndarray, lw: Dict[str, Any], r4: bool = False, layer_idx=None,
    ffn_blocks: int = 1,
) -> jnp.ndarray:
    """SwiGLU MLP (reference ``FeedForward``). ``r4`` applies the
    SpinQuant online Hadamard to the gate output (w2 pre-folded)."""
    if "w13" in lw:
        # NOTE: a single-launch FFN megakernel (w13 → silu·mul → w2 in
        # one Pallas invocation) was built and hardware-adjudicated in
        # round 2: parity single-stream, −2% at serving batch — the
        # phase-transition work costs exactly what the saved launch
        # recovers (PERF.md "megakernel lesson"). Deleted in round 3.
        # merged gate+up projection: ONE kernel invocation over a
        # 2I-wide grid — each extra Pallas launch costs pipeline
        # fill/drain + dispatch (profiled: the 14-step w1/w3 kernels run
        # at ~82% streaming efficiency vs 95% for the long-grid output
        # head), so halving FFN launches buys ~0.3 ms/decode-step at 8B
        h13 = _lin(x, lw["w13"], layer_idx)
        if ffn_blocks > 1:
            # TP-aligned merged projection: w13 rows interleaved
            # device-major ([w1_d | w3_d] per block — see
            # parallel.sharding.interleave_w13_params), so the gate/up
            # split is per-block and shard-local (the naive middle
            # split crosses shard boundaries, exactly the fused-qkv
            # resharding failure mode found in round 3)
            *lead, twoI = h13.shape
            ipd = twoI // (2 * ffn_blocks)
            h4 = h13.reshape(*lead, ffn_blocks, 2 * ipd)
            h1 = h4[..., :ipd].reshape(*lead, twoI // 2)
            h3 = h4[..., ipd:].reshape(*lead, twoI // 2)
        else:
            h1, h3 = jnp.split(h13, 2, axis=-1)
    else:
        # legacy split layout (older checkpoints)
        h1 = _lin(x, lw["w1"], layer_idx)
        h3 = _lin(x, lw["w3"], layer_idx)
    h = jax.nn.silu(h1) * h3
    if r4:
        from torchao_tpu.prototype.spinquant.hadamard_utils import (
            apply_hadamard,
        )

        h = apply_hadamard(h)
    return _lin(h, lw["w2"], layer_idx)


def transformer_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,      # [B, T] int32
    input_pos,                # scalar int32: start position of `tokens`
    cache,                    # stacked KV cache pytree or None
    freqs_full: jnp.ndarray,  # [block_size, Dh/2, 2]
    args: ModelArgs,
    mask: Optional[jnp.ndarray] = None,
    *,
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, T, D] (skips embed)
    head: bool = True,        # False → return hidden states, skip norm+head
):
    """Full forward. Returns (logits [B, T, V], new_cache) — or
    (hidden [B, T, D], new_cache) with ``head=False``.

    ``input_pos`` may be a scalar (whole batch at one position — the
    prefill/decode loop) or a [B] vector (per-slot positions — the
    continuous-batching engine). ``inputs_embeds``/``head`` let a
    pipeline stage run only its slice of the network
    (``parallel/pipeline.py``).
    """
    if inputs_embeds is not None:
        x = inputs_embeds
        B, T = x.shape[:2]
    else:
        B, T = tokens.shape
        x = ops.embedding(params["tok_embeddings"]["weight"], tokens)

    vector_pos = getattr(input_pos, "ndim", 0) == 1
    if vector_pos:
        # per-slot rotary table rows: [B, T, Dh/2, 2]
        freqs = freqs_full[input_pos[:, None] + jnp.arange(T)[None, :]]
    else:
        freqs = jax.lax.dynamic_slice_in_dim(
            freqs_full, input_pos, T, axis=0
        )

    if mask is None:
        if cache is not None:
            kq0 = (
                cache.get("k_q", cache.get("k"))
                if isinstance(cache, dict)
                else jax.tree_util.tree_leaves(cache)[0]
            )
            # S is axis 3 in every layout: head-major [L, B, H, S, Dh]
            # and the split-flat K [L, B, Hkv·Dh, S] (ndim 4)
            S = kq0.shape[3]
            # position t (absolute input_pos + t) attends to cache slot s
            # iff s <= input_pos + t
            if vector_pos:
                pos = input_pos[:, None, None] + jnp.arange(T)[None, :, None]
                mask = jnp.arange(S)[None, None, :] <= pos  # [B, T, S]
            else:
                pos = input_pos + jnp.arange(T)[:, None]
                mask = jnp.arange(S)[None, :] <= pos
        else:
            mask = jnp.tril(jnp.ones((T, T), bool))

    # The scan iterates over LAYER INDICES; the stacked weights stay
    # closed over (they are jit args, not constants) and quantized
    # linears index the layer inside their Pallas BlockSpecs — scanning
    # over sliced weights instead would materialize a copy of every
    # weight per step (XLA cannot fuse a dynamic-slice into a custom
    # call; profiled at ~40% of the decode step). Norm weights are
    # sliced here: tiny, and XLA fuses slices into elementwise consumers.
    lws = params["layers"]

    def body(x, layer_in):
        l, layer_cache = layer_in
        h, new_cache = _attention(
            rms_norm(x, lws["attention_norm"]["weight"][l], args.norm_eps),
            lws["attention"], freqs, mask, layer_cache, input_pos, args,
            layer_idx=l,
        )
        x = x + h
        x = x + _row_parallel_out(_feed_forward(
            rms_norm(x, lws["ffn_norm"]["weight"][l], args.norm_eps),
            lws["feed_forward"],
            r4=args.use_r4_hadamard,
            layer_idx=l,
            ffn_blocks=args.ffn_device_blocks,
        ), args)
        return x, new_cache

    layer_ids = jnp.arange(args.n_layer, dtype=jnp.int32)
    smajor_stacked = (
        cache is not None
        and isinstance(cache, dict)
        and "k_q" in cache
        and cache["k_q"].ndim == 4  # split-flat K [L, B, Hkv·Dh, S]
    )
    if smajor_stacked:
        # the whole stacked cache rides the scan as a CARRY: the update
        # writes layer l in place and the bdq kernel indexes layer l in
        # its BlockSpecs — no per-layer slice (xs) / restack (ys)
        # traffic, which profiled as a full cache copy per decode step.
        def body_c(carry, l):
            x, c = carry
            h, c = _attention(
                rms_norm(
                    x, lws["attention_norm"]["weight"][l], args.norm_eps
                ),
                lws["attention"], freqs, mask, c, input_pos, args,
                layer_idx=l, stacked_cache=True,
            )
            x = x + h
            x = x + _row_parallel_out(_feed_forward(
                rms_norm(x, lws["ffn_norm"]["weight"][l], args.norm_eps),
                lws["feed_forward"],
                r4=args.use_r4_hadamard,
                layer_idx=l,
                ffn_blocks=args.ffn_device_blocks,
            ), args)
            return (x, c), None

        (x, new_cache), _ = jax.lax.scan(body_c, (x, cache), layer_ids)
    elif cache is not None:
        x, new_cache = jax.lax.scan(body, x, (layer_ids, cache))
    else:
        def body2(x, l):
            x, _ = body(x, (l, None))
            return x, None

        x, _ = jax.lax.scan(body2, x, layer_ids)
        new_cache = None

    if not head:
        return x, new_cache
    x = rms_norm(x, params["norm"]["weight"], args.norm_eps)
    if args.tie_word_embeddings and "output" not in params:
        # tied table read in full precision every step: 788 MB/step bf16
        # on Llama-3.2-3B (profiled 1.04 ms = the single largest 3B
        # decode op). quantize flows UNTIE the head (init_utils.
        # untie_quantized_head) — the reference does the same: gpt-fast
        # materializes ``output`` as a separate Linear that quantize_
        # then converts, while the embedding stays high-precision
        logits = ops.linear(x, params["tok_embeddings"]["weight"])
    else:
        logits = ops.linear(x, params["output"]["weight"])
        if args.tp_axis is not None and not args.tie_word_embeddings:
            # column-parallel head: every shard holds V/m vocab rows —
            # gather the full logits (tiled along the vocab dim)
            logits = jax.lax.all_gather(
                logits, args.tp_axis, axis=logits.ndim - 1, tiled=True
            )
    return logits, new_cache


def _scan_no_cache(body, x, layers):
    def body2(x, lw):
        x, _ = body(x, (lw, None))
        return x, None

    x, _ = jax.lax.scan(body2, x, layers)
    return x, None


# ---------------------------------------------------------------------------
# init + wrapper
# ---------------------------------------------------------------------------


def init_params(
    args: ModelArgs, key: jax.Array, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Random-init params pytree with stacked layer weights."""
    D, I = args.dim, args.intermediate_size
    H, Hkv, Dh, L = args.n_head, args.n_local_heads, args.head_dim, args.n_layer
    V = args.vocab_size
    keys = jax.random.split(key, 8)

    def init(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dtype)

    qkv_out = (H + 2 * Hkv) * Dh
    params = {
        "tok_embeddings": {"weight": init(keys[0], (V, D), D)},
        "layers": {
            "attention": {
                "wqkv": init(keys[1], (L, qkv_out, D), D),
                "wo": init(keys[2], (L, D, H * Dh), H * Dh),
            },
            "feed_forward": {
                # gate (w1) and up (w3) projections stored MERGED along
                # out-features ([:I] = w1, [I:] = w3), like wqkv
                "w13": init(keys[3], (L, 2 * I, D), D),
                "w2": init(keys[5], (L, D, I), I),
            },
            "attention_norm": {"weight": jnp.ones((L, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, D), dtype)},
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    if not args.tie_word_embeddings:
        params["output"] = {"weight": init(keys[6], (V, D), D)}
    return params


def default_linear_filter(path: str, leaf) -> bool:
    """Quantize the transformer's linear weights only (not embeddings or
    norms) — the analog of the reference's ``_is_linear`` filter."""
    names = ("wqkv", "wo", "w13", "w1", "w2", "w3", "output")
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim in (2, 3)
        and any(path.endswith(f"{n}.weight") or path.endswith(n)
                or f".{n}." in path for n in names)
        and "tok_embeddings" not in path
        and "norm" not in path
    )


def ffn_only_filter(path: str, leaf) -> bool:
    """FFN linears only (reference generate.py ``ffn_only`` — used for
    mixed sparse/quant recipes like int8dq+2:4-mlp)."""
    names = ("w13", "w1", "w2", "w3")
    return default_linear_filter(path, leaf) and any(
        path.endswith(f"{n}.weight") or path.endswith(n)
        or f".{n}." in path for n in names
    )


def attn_only_filter(path: str, leaf) -> bool:
    """Attention linears only (reference ``not_ffn_only`` complement)."""
    names = ("wqkv", "wo")
    return default_linear_filter(path, leaf) and any(
        path.endswith(f"{n}.weight") or path.endswith(n)
        or f".{n}." in path for n in names
    )


def ffn_or_attn_only_filter(path: str, leaf) -> bool:
    """FFN + attention, excluding the output head (reference
    ``ffn_or_attn_only``)."""
    return ffn_only_filter(path, leaf) or attn_only_filter(path, leaf)


class Transformer:
    """Thin stateless wrapper bundling args + jitted entry points."""

    def __init__(self, args: ModelArgs, dtype=jnp.bfloat16):
        self.args = args
        self.dtype = dtype
        self.freqs = precompute_freqs_cis(args)

    @classmethod
    def from_name(cls, name: str, dtype=jnp.bfloat16):
        return cls(ModelArgs.from_name(name), dtype)

    def init_params(self, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return init_params(self.args, key, self.dtype)

    def setup_caches(
        self, batch_size, max_seq_len, quantize: bool = False
    ):
        max_seq_len = min(max_seq_len, self.args.block_size)
        return init_kv_cache(
            self.args, batch_size, max_seq_len, self.dtype, quantize
        )

    def __call__(self, params, tokens, input_pos=0, cache=None, mask=None):
        return transformer_forward(
            params, tokens, input_pos, cache, self.freqs, self.args, mask
        )
