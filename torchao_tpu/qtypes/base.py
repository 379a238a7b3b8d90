"""Base machinery for quantized array pytrees.

TPU-native equivalent of the reference's ``TorchAOBaseTensor``
(``torchao/utils.py:693``): where the reference uses tensor subclasses with
``__torch_dispatch__`` + declarative ``tensor_data_names`` /
``tensor_attribute_names`` flatten rules, here a quantized array is a frozen
dataclass registered as a JAX pytree — array fields are leaves (so
``jax.jit``, sharding, donation and serialization all work for free) and
everything else is static aux data baked into the trace.

Also hosts the packing-format enum (the v2 ``PackingFormat`` analog,
reference ``quantize_/common/packing_format.py:12``) and the kernel
preference knob (reference ``quantize_/common/kernel_preference.py:14``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


class PackingFormat(str, enum.Enum):
    """How sub-byte quantized data is laid out in memory.

    TPU-native analog of the reference ``PackingFormat``
    (``packing_format.py:12``): PLAIN = unpacked int8 storage;
    TILED_NIBBLES = two int4 values per int8 byte, *half-split* along the
    contraction axis (byte ``[n, k]`` holds ``w[n, k]`` in the low nibble
    and ``w[n, k + K/2]`` in the high nibble) so a Pallas kernel unpacks
    into two contiguous lane-aligned blocks without any interleave shuffle —
    the TPU replacement for tinygemm's tensor-core tiled layout
    (``tensor_core_tiled_layout.py:118``).
    """

    PLAIN = "plain"
    TILED_NIBBLES = "tiled_nibbles"
    # uint1-7 power-of-2 bit shards packed densely and concatenated into
    # one flat uint8 buffer (the reference's uintx bit-packed layout,
    # ``uintx/bitpacking.py``) — true sub-byte storage for odd widths
    BIT_SHARDS = "bit_shards"


class KernelPreference(str, enum.Enum):
    """Which implementation backs a quantized op (reference
    ``kernel_preference.py:14``): AUTO picks Pallas when available on the
    current backend, XLA forces the jnp fallback path, PALLAS forces the
    Pallas kernel."""

    AUTO = "auto"
    XLA = "xla"
    PALLAS = "pallas"


def qarray_dataclass(cls):
    """Class decorator: frozen dataclass + pytree registration.

    Fields with ``metadata={"static": True}`` become pytree aux data
    (hashable, baked into jit traces); all other fields are child leaves.
    This is the declarative flatten/unflatten contract mirroring the
    reference's ``tensor_data_names``/``tensor_attribute_names``
    (``torchao/utils.py:726-760``).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    cls.__qarray_data_fields__ = tuple(data_fields)
    cls.__qarray_meta_fields__ = tuple(meta_fields)
    return cls


def static_field(**kwargs):
    """A dataclass field that is pytree aux data (static under jit)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class QuantizedArray:
    """Mixin-style base for quantized array pytrees.

    Subclasses are ``@qarray_dataclass``es holding quantized payload
    (``qdata``), qparams (``scale`` / ``zero_point``) and static layout
    metadata. The logical (unquantized) shape is exposed via ``.shape``.
    """

    # --- logical view -----------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def dtype(self):
        """The high-precision dtype this array dequantizes to by default."""
        return getattr(self, "activation_dtype", jnp.bfloat16)

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        raise NotImplementedError

    def unstack_layer(self) -> "QuantizedArray":
        """Adjust static metadata after an outer transform (``lax.scan`` /
        ``vmap``) has sliced off the leading "layer" axis of the array
        leaves. Default: drop the leading element of ``block_size`` and
        ``logical_shape`` when present."""
        updates = {}
        bs = getattr(self, "block_size", None)
        if bs is not None and len(bs) > self._leaf_ndim():
            updates["block_size"] = tuple(bs[1:])
        ls = getattr(self, "logical_shape", None)
        if ls is not None and len(ls) > self._leaf_ndim():
            updates["logical_shape"] = tuple(ls[1:])
        if not updates:
            return self
        return dataclasses.replace(self, **updates)

    def take_layer(self, l) -> "QuantizedArray":
        """Dynamic-index the leading layer axis of every array leaf
        (traced index ``l``) and fix static metadata — the
        dynamic-slice analog of :meth:`unstack_layer`. NOTE: when the
        result feeds a Pallas kernel, XLA must MATERIALIZE the slice (a
        full per-layer copy — custom calls can't fuse slices); prefer
        kernels that take the stacked array + layer index directly
        (e.g. ``int4_dq_matmul(..., layer_idx=)``)."""
        updates = {}
        for name in self.__qarray_data_fields__:
            v = getattr(self, name)
            if isinstance(v, QuantizedArray):
                updates[name] = v.take_layer(l)  # nested (e.g. LAQT)
            elif v is not None:
                updates[name] = v[l]
        return dataclasses.replace(self, **updates).unstack_layer()

    def merge_leading(self, n: int = 2) -> "QuantizedArray":
        """Merge the leading ``n`` stacked axes of every array leaf into
        one (``[L, E, ...] -> [L*E, ...]``) and fix static metadata.

        Free in XLA (contiguous leading reshape, no copy) — it lets a
        scalar-prefetch kernel index a (layer, expert) pair as ONE flat
        leading index ``l*E + e``, which is how the MoE gathered-decode
        path streams only the routed experts' bytes
        (models/mixtral.py ``_moe_ffn`` mode="gathered")."""
        updates = {}
        for name in self.__qarray_data_fields__:
            v = getattr(self, name)
            if isinstance(v, QuantizedArray):
                updates[name] = v.merge_leading(n)
            elif v is not None:
                updates[name] = v.reshape((-1,) + v.shape[n:])
        out = dataclasses.replace(self, **updates)
        meta = {}
        bs = getattr(self, "block_size", None)
        if bs is not None and len(bs) > out._leaf_ndim():
            meta["block_size"] = tuple(bs[n - 1:])
        ls = getattr(self, "logical_shape", None)
        if ls is not None and len(ls) > out._leaf_ndim():
            merged = 1
            for d in ls[:n]:
                merged *= d
            meta["logical_shape"] = (merged,) + tuple(ls[n:])
        return dataclasses.replace(out, **meta) if meta else out

    def _leaf_ndim(self) -> int:
        """ndim of the primary data leaf (qdata) as currently stored."""
        for name in self.__qarray_data_fields__:
            v = getattr(self, name)
            if v is not None and hasattr(v, "ndim"):
                return v.ndim
        raise ValueError("no array leaves")

    # --- convenience ------------------------------------------------------
    def nbytes(self) -> int:
        total = 0
        for name in self.__qarray_data_fields__:
            v = getattr(self, name)
            if v is None:
                continue
            if isinstance(v, QuantizedArray):  # nested (LAQT, Fp6Dual)
                total += v.nbytes()
            else:
                total += v.size * v.dtype.itemsize
        return total

    def _replace(self, **updates):
        return dataclasses.replace(self, **updates)
