"""Bit-packing for sub-byte quantized data.

TPU-native replacements for the reference's packing kernels:

- int4 *half-split nibble* packing (replaces tinygemm's
  ``aten._convert_weight_to_int4pack`` tensor-core tiled layout,
  ``csrc/cuda/tensor_core_tiled_layout/tensor_core_tiled_layout.cu``):
  byte ``[..., k]`` holds element ``k`` in the low nibble and element
  ``k + K/2`` in the high nibble. Unpacking is two shifts + a concat of
  contiguous blocks — no element interleave, so Pallas kernels unpack in
  VREGs on the lane dimension at full VPU rate.

- generic uint1-7 power-of-2-shard packing (replaces
  ``torchao/dtypes/uintx/bitpacking.py:221-250``): a b-bit value is split
  into its 4/2/1-bit binary components, each packed densely.

All functions are pure jnp and jittable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp


def pack_int4(q: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Pack unsigned 4-bit values (stored in int8/uint8, range 0..15) two
    per byte, half-split along ``axis``.

    ``packed[..., k] = q[..., k] | (q[..., k + K/2] << 4)``
    """
    assert q.shape[axis] % 2 == 0, "axis length must be even to pack int4"
    q = jnp.moveaxis(q, axis, -1)
    k = q.shape[-1]
    lo = q[..., : k // 2].astype(jnp.uint8)
    hi = q[..., k // 2 :].astype(jnp.uint8)
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return jnp.moveaxis(packed, -1, axis)


def unpack_int4(packed: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`; returns uint8 values in 0..15."""
    p = jnp.moveaxis(packed, axis, -1).astype(jnp.uint8)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    out = jnp.concatenate([lo, hi], axis=-1)
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# generic uint1-7 packing (power-of-2 shards), reference bitpacking.py
# ---------------------------------------------------------------------------

# bit shards per bit-width: each b-bit value decomposes into these components
_SHARDS: Dict[int, List[int]] = {
    1: [1],
    2: [2],
    3: [2, 1],
    4: [4],
    5: [4, 1],
    6: [4, 2],
    7: [4, 2, 1],
    8: [8],
}


def _pack_shard(vals: jnp.ndarray, bits: int, axis: int) -> jnp.ndarray:
    """Densely pack ``bits``-bit values (uint8 in [0, 2^bits)) along axis."""
    per_byte = 8 // bits
    v = jnp.moveaxis(vals, axis, -1).astype(jnp.uint8)
    n = v.shape[-1]
    assert n % per_byte == 0, (n, per_byte)
    v = v.reshape(v.shape[:-1] + (per_byte, n // per_byte))
    out = jnp.zeros(v.shape[:-2] + (n // per_byte,), jnp.uint8)
    for i in range(per_byte):
        out = out | (v[..., i, :] << (bits * i))
    return jnp.moveaxis(out, -1, axis)


def _unpack_shard(packed: jnp.ndarray, bits: int, n: int, axis: int) -> jnp.ndarray:
    per_byte = 8 // bits
    p = jnp.moveaxis(packed, axis, -1).astype(jnp.uint8)
    mask = (1 << bits) - 1
    parts = [
        ((p >> (bits * i)) & mask) for i in range(per_byte)
    ]
    v = jnp.stack(parts, axis=-2)  # [..., per_byte, n/per_byte]
    v = v.reshape(v.shape[:-2] + (n,))
    return jnp.moveaxis(v, -1, axis)


def pack_uintx(vals: jnp.ndarray, nbits: int, axis: int = -1) -> Tuple[jnp.ndarray, ...]:
    """Pack b-bit unsigned values into power-of-2 bit shards.

    Returns one densely packed uint8 array per shard (e.g. nbits=3 →
    (2-bit shard, 1-bit shard)). Mirrors reference
    ``torchao/dtypes/uintx/bitpacking.py`` ``pack``.
    """
    assert 1 <= nbits <= 8
    shards = _SHARDS[nbits]
    out = []
    shift = 0
    # high shards first, matching the reference's ordering of components
    for bits in shards:
        shard_vals = (vals >> shift) & ((1 << bits) - 1)
        # NOTE: reference shifts from high bits; we use low-first which is
        # self-consistent for pack/unpack round trips.
        out.append(_pack_shard(shard_vals.astype(jnp.uint8), bits, axis))
        shift += bits
    return tuple(out)


def unpack_uintx(
    shards: Sequence[jnp.ndarray], nbits: int, n: int, axis: int = -1
) -> jnp.ndarray:
    """Inverse of :func:`pack_uintx`; returns uint8 values in [0, 2^nbits)."""
    bits_list = _SHARDS[nbits]
    assert len(shards) == len(bits_list)
    out = None
    shift = 0
    for packed, bits in zip(shards, bits_list):
        vals = _unpack_shard(packed, bits, n, axis)
        contrib = vals.astype(jnp.uint8) << shift
        out = contrib if out is None else (out | contrib)
        shift += bits
    return out
