"""IntxArray — the AffineQuantizedTensor equivalent for integer dtypes.

Covers the reference's ``AffineQuantizedTensor`` + intx layouts
(``torchao/dtypes/affine_quantized_tensor.py:57``, plain layout
``uintx/plain_layout.py``, tinygemm tiled layout
``uintx/tensor_core_tiled_layout.py``) as a single JAX pytree class with a
static ``PackingFormat`` instead of a TensorImpl subclass registry:

- ``qdata``: int8/uint8 (PLAIN, any 1-8 bit target) or uint8 half-split
  nibbles (TILED_NIBBLES, int4/uint4 only)
- ``scale`` / ``zero_point``: blocked shape (input shape // block_size)
- static metadata: block_size, target dtype name, qmin/qmax, zero-point
  domain, packing format, logical shape

Construction mirrors ``to_affine_quantized_intx``
(``affine_quantized_tensor.py:232-330`` ``from_hp_to_intx``): the
zero-point-domain decides which choose/quantize primitive runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    PackingFormat,
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.qtypes.packing import pack_int4, unpack_int4
from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
)


def _tiled_eff_qparams(
    scale, zero_point, quant_min, quant_max,
    zero_point_domain=None,
):
    """Kernel-form qparams for K-major TILED_NIBBLES scale/zero
    ([.., K/g, N], lo-half rows then hi-half rows): the batched-int8
    kernel consumes ``dq_lo = lo·s + (z − mid·s)`` and
    ``dq_hi = (b′ − lo)/16·s + (z + (8 − mid)·s)``, so precompute the
    four per-group row families once at quantize time instead of per
    call inside the decode scan:

      rows [0,      nG):  s_lo            (lo-half group scales)
      rows [nG,   2·nG):  s_hi / 16       (hi-half scales, ÷16 folded)
      rows [2·nG, 3·nG):  z_lo − mid·s_lo (pre-biased lo zeros)
      rows [3·nG, 4·nG):  z_hi + (8−mid)·s_hi

    FAMILY-MAJOR in ONE ``[.., 4·K/g, N]`` bf16 array: a single weight
    leaf (simpler accounting/slicing/sharding) that the kernel reads as
    four index-mapped block streams at offsets f·nbk. (A per-group
    interleave was measured 17% SLOWER end-to-end: family slices become
    stride-4 sublane gathers in VMEM.)

    INT zero-point domain (HQQ/gemlite int4: ``dq = (q − zp)·s``) maps
    onto the same form via the float-equivalent zero
    ``z = (mid − zp)·s``."""
    mid = (quant_max + quant_min + 1) / 2 - quant_min
    nG2 = scale.shape[-2]
    nG = nG2 // 2
    if nG == 0 or nG2 % 2:
        return None
    s = scale.astype(jnp.float32)
    if zero_point is None:
        z = jnp.zeros_like(s)
    elif zero_point_domain is ZeroPointDomain.INT:
        z = (mid - zero_point.astype(jnp.float32)) * s
    else:
        z = zero_point.astype(jnp.float32)
    s_lo, s_hi = s[..., :nG, :], s[..., nG:, :]
    z_lo, z_hi = z[..., :nG, :], z[..., nG:, :]
    return jnp.concatenate(
        [
            s_lo,
            s_hi / 16.0,
            z_lo - mid * s_lo,
            z_hi + (8.0 - mid) * s_hi,
        ],
        axis=-2,
    ).astype(jnp.bfloat16)  # [.., 4·nG, N]


def _tiled_eff_qparams_chunked(
    scale, zero_point, quant_min, quant_max, zero_point_domain,
    group_size,
):
    """``_tiled_eff_qparams`` + chunked block-major reorder when the
    shape is eligible (canonical chunk = 1024 packed rows; family slabs
    ≥ 8 sublanes). Returns ``(qparams_eff, chunk_groups_or_None)`` —
    the merged-DMA decode kernel reads the chunked layout as ONE block
    stream per grid step (kernels/int4_matmul.py ``_kernel_bint8m``)."""
    import os

    qe = _tiled_eff_qparams(
        scale, zero_point, quant_min, quant_max, zero_point_domain
    )
    if qe is None:
        return None, None
    g = int(group_size)
    nG = qe.shape[-2] // 4
    cb = 1024 // g if g and 1024 % g == 0 else 0
    # geometries where the canonical chunk doesn't divide the group
    # count (e.g. Llama-3.2-3B dim 3072: nG=48, cb=32) halve the chunk
    # until it does — the merged-DMA decode stream is a measured win
    # (round 3/4) and should not silently fall back to family-major
    # just because the model dim isn't a 1024-multiple
    while cb >= 8 and nG % cb:
        cb //= 2
    if (
        cb >= 8  # family slabs ≥ 8 sublanes (Mosaic slicing)
        and nG % cb == 0
        and os.environ.get("TORCHAO_TPU_QPARAMS_LAYOUT") != "family"
    ):
        from torchao_tpu.kernels.int4_matmul import (
            eff_qparams_to_block_major,
        )

        return eff_qparams_to_block_major(qe, cb), cb
    return qe, None


def _nbits_of(target_dtype: str) -> int:
    return int(target_dtype.lstrip("uint").lstrip("int") or 8)


@qarray_dataclass
class IntxArray(QuantizedArray):
    qdata: jnp.ndarray
    scale: jnp.ndarray
    zero_point: Optional[jnp.ndarray]
    block_size: Tuple[int, ...] = static_field()
    target_dtype: str = static_field(default="int8")
    quant_min: Union[int, float] = static_field(default=None)
    quant_max: Union[int, float] = static_field(default=None)
    zero_point_domain: ZeroPointDomain = static_field(
        default=ZeroPointDomain.INT
    )
    packing_format: PackingFormat = static_field(default=PackingFormat.PLAIN)
    logical_shape: Tuple[int, ...] = static_field(default=None)
    activation_dtype: str = static_field(default="bfloat16")
    # Precomputed kernel-form qparams for TILED_NIBBLES (optional): the
    # batched-int8 Pallas kernel consumes scale/zero in a derived form
    # (hi-half scales ÷16; zeros pre-biased per half). Deriving them
    # per call inside the decode scan costs ~2 GB/token of HBM traffic
    # at 8B; from_hp precomputes them once as ONE family-major
    # [.., 4·K/g, N] bf16 leaf (s_lo | s_hi/16 | z2_lo | z2_hi row
    # blocks — see _tiled_eff_qparams).
    qparams_eff: Optional[jnp.ndarray] = None
    # When set: qparams_eff is in the chunked BLOCK-MAJOR layout
    # (this many groups per chunk, all four families contiguous per
    # chunk) so the merged-DMA decode kernel reads ONE qparams stream
    # per grid step. None = family-major rows.
    qparams_eff_chunk: Optional[int] = static_field(default=None)
    # TILED_NIBBLES bytes stored pre-XORed with 0x80: the decode
    # kernel's high-nibble rebias ``b' = byte ^ 0x80`` becomes a free
    # bitcast ((b'&0xF) == (byte&0xF), so the low nibble is unchanged) —
    # halves the per-byte VPU unpack work on the weight stream.
    nibbles_xored: bool = static_field(default=False)

    # --- pytree-facing ----------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        if self.logical_shape is not None:
            return tuple(self.logical_shape)
        return self.qdata.shape

    @property
    def dtype(self):
        return jnp.dtype(self.activation_dtype)

    @property
    def nbits(self) -> int:
        name = self.target_dtype.lstrip("u").replace("int", "")
        return int(name) if name.isdigit() else 8

    # --- construction -----------------------------------------------------
    @classmethod
    def from_hp(
        cls,
        w: jnp.ndarray,
        mapping_type: MappingType,
        block_size: Sequence[int],
        target_dtype: str,
        quant_min=None,
        quant_max=None,
        eps: Optional[float] = None,
        scale_dtype=None,
        zero_point_dtype=None,
        zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT,
        preserve_zero: bool = True,
        packing_format: PackingFormat = PackingFormat.PLAIN,
    ) -> "IntxArray":
        """Quantize a high-precision weight.

        Semantics per zero-point domain (reference ``from_hp_to_intx``,
        ``affine_quantized_tensor.py:268-320``):
          - FLOAT & not preserve_zero → tinygemm choose/quantize
          - INT & not preserve_zero → dont_preserve_zero choose, INT quantize
          - NONE → symmetric, no zero point stored
          - INT & preserve_zero → standard affine
        """
        quant_min, quant_max = qp.qmin_qmax(target_dtype, quant_min, quant_max)
        if zero_point_domain is ZeroPointDomain.FLOAT and not preserve_zero:
            scale, zero_point = qp.choose_qparams_affine_tinygemm(
                w, mapping_type, block_size, target_dtype, quant_min,
                quant_max, eps, scale_dtype, zero_point_dtype,
            )
            qdata = qp.quantize_affine_tinygemm(
                w, block_size, scale, zero_point, target_dtype,
                quant_min, quant_max,
            )
        elif zero_point_domain is ZeroPointDomain.INT and not preserve_zero:
            scale, zero_point = qp.choose_qparams_affine_dont_preserve_zero(
                w, mapping_type, block_size, target_dtype, quant_min,
                quant_max, eps, scale_dtype, zero_point_dtype,
            )
            qdata = qp.quantize_affine(
                w, block_size, scale, zero_point, target_dtype,
                quant_min, quant_max,
            )
        elif zero_point_domain is ZeroPointDomain.NONE:
            scale, zero_point = qp.choose_qparams_affine(
                w, mapping_type, block_size, target_dtype, quant_min,
                quant_max, eps, scale_dtype, zero_point_dtype,
            )
            zero_point = None
            qdata = qp.quantize_affine_no_zero_point(
                w, block_size, scale, None, target_dtype,
                quant_min, quant_max,
            )
        else:
            scale, zero_point = qp.choose_qparams_affine(
                w, mapping_type, block_size, target_dtype, quant_min,
                quant_max, eps, scale_dtype, zero_point_dtype,
            )
            qdata = qp.quantize_affine(
                w, block_size, scale, zero_point, target_dtype,
                quant_min, quant_max,
            )

        logical_shape = tuple(w.shape)
        if packing_format is PackingFormat.TILED_NIBBLES:
            # any 4-bit-range target packs (int4, uint4, or the reference's
            # tinygemm int32-with-qmin0/qmax15 convention). Storage is
            # K-MAJOR: qdata [..., K/2, N], scale/zero [..., K/g, N] — the
            # MXU-natural orientation consumed by the Pallas kernel
            # (kernels/int4_matmul.py).
            assert quant_max - quant_min <= 15, (quant_min, quant_max)
            if quant_min != 0:
                qdata = (qdata.astype(jnp.int32) - quant_min)
            qdata = pack_int4(qdata.astype(jnp.uint8), axis=-1)
            qdata = qdata ^ jnp.uint8(0x80)  # see nibbles_xored
            qdata = jnp.swapaxes(qdata, -1, -2)
            # full-K groups give rank-(n-1) qparams; normalize to
            # [..., N, 1] before transposing to K-major [..., 1, N]
            while scale.ndim < w.ndim:
                scale = scale[..., None]
            scale = jnp.swapaxes(scale, -1, -2)
            if zero_point is not None:
                while zero_point.ndim < w.ndim:
                    zero_point = zero_point[..., None]
                zero_point = jnp.swapaxes(zero_point, -1, -2)
            qparams_eff, qparams_eff_chunk = _tiled_eff_qparams_chunked(
                scale, zero_point, quant_min, quant_max,
                zero_point_domain, block_size[-1],
            )
        else:
            qparams_eff = None
            qparams_eff_chunk = None

        if packing_format is PackingFormat.BIT_SHARDS:
            from torchao_tpu.qtypes.packing import pack_uintx

            nbits = _nbits_of(target_dtype)
            assert 1 <= nbits <= 7, target_dtype
            if quant_min != 0:
                qdata = (qdata.astype(jnp.int32) - quant_min)
            # shards keep their leading axes and concatenate along the
            # packed (last) axis: qdata [..., N, Σ K·bits/8] — so stacked
            # [L, ...] weights stay layer-sliceable (take_layer /
            # lax.scan) and out-feature slicing works unchanged
            shards = pack_uintx(qdata.astype(jnp.uint8), nbits, axis=-1)
            qdata = jnp.concatenate(shards, axis=-1)

        return cls(
            qdata=qdata,
            scale=scale,
            zero_point=zero_point,
            block_size=tuple(block_size),
            target_dtype=target_dtype,
            quant_min=quant_min,
            quant_max=quant_max,
            zero_point_domain=zero_point_domain,
            packing_format=packing_format,
            logical_shape=logical_shape,
            activation_dtype=str(jnp.dtype(w.dtype)),
            qparams_eff=qparams_eff,
            qparams_eff_chunk=qparams_eff_chunk,
            nibbles_xored=(
                packing_format is PackingFormat.TILED_NIBBLES
            ),
        )

    # --- slicing (TP / serving weight loading) -----------------------------
    def slice_out_features(self, start: int, size: int) -> "IntxArray":
        """Logical slice along out-features (N) — the op vLLM-style weight
        loaders and manual TP sharding need (reference implements
        aten.slice on AQT for exactly this,
        ``affine_quantized_tensor_ops.py:467-598``)."""
        import dataclasses as _dc

        if self.packing_format is PackingFormat.TILED_NIBBLES:
            # K-major storage: N is the LAST axis of every leaf
            qdata = self.qdata[..., start : start + size]
            scale = self.scale[..., start : start + size]
            zp = (
                None if self.zero_point is None
                else self.zero_point[..., start : start + size]
            )
            extra = {
                name: getattr(self, name)[..., start : start + size]
                for name in ("qparams_eff",)
                if getattr(self, name) is not None
            }
            ls = list(self.shape)
            ls[-2] = size
            return _dc.replace(
                self, qdata=qdata, scale=scale, zero_point=zp,
                logical_shape=tuple(ls), **extra,
            )
        else:
            qdata = self.qdata[..., start : start + size, :]
            scale = self.scale[..., start : start + size, :] \
                if self.scale.ndim == self.qdata.ndim \
                else self.scale[..., start : start + size]
            zp = self.zero_point
            if zp is not None:
                zp = (
                    zp[..., start : start + size, :]
                    if zp.ndim == self.qdata.ndim
                    else zp[..., start : start + size]
                )
        ls = list(self.shape)
        ls[-2] = size
        return _dc.replace(
            self, qdata=qdata, scale=scale, zero_point=zp,
            logical_shape=tuple(ls),
        )

    @classmethod
    def concat_out_features(cls, parts) -> "IntxArray":
        """Concatenate along out-features (N) — the inverse of
        :meth:`slice_out_features`, used by merged-projection init
        (w13 = [w1; w3]) and vLLM-style shard assembly."""
        import dataclasses as _dc

        a = parts[0]
        assert all(
            p.packing_format is a.packing_format for p in parts
        )
        if a.packing_format is PackingFormat.TILED_NIBBLES:
            axis = -1  # K-major: N is the last axis of every leaf
            kw = {
                name: jnp.concatenate(
                    [getattr(p, name) for p in parts], axis=axis
                )
                for name in ("qdata", "scale", "zero_point", "qparams_eff")
                if getattr(a, name) is not None
            }
        else:
            assert a.packing_format is PackingFormat.PLAIN
            kw = {"qdata": jnp.concatenate(
                [p.qdata for p in parts], axis=-2
            )}
            for name in ("scale", "zero_point"):
                v = getattr(a, name)
                if v is None:
                    continue
                axis = -2 if v.ndim == a.qdata.ndim else -1
                kw[name] = jnp.concatenate(
                    [getattr(p, name) for p in parts], axis=axis
                )
        ls = list(a.shape)
        ls[-2] = sum(p.shape[-2] for p in parts)
        return _dc.replace(a, logical_shape=tuple(ls), **kw)

    # --- unpack / dequantize ----------------------------------------------
    def unpacked_qdata(self) -> jnp.ndarray:
        """qdata with packing undone — integer values in the target dtype's
        range, stored as int8/uint8, logical [..., N, K] orientation."""
        if self.packing_format is PackingFormat.PLAIN:
            return self.qdata
        if self.packing_format is PackingFormat.BIT_SHARDS:
            from torchao_tpu.qtypes.packing import _SHARDS, unpack_uintx

            nbits = _nbits_of(self.target_dtype)
            n_last = int(self.logical_shape[-1])
            shards, off = [], 0
            for bits in _SHARDS[nbits]:
                width = n_last * bits // 8
                shards.append(self.qdata[..., off : off + width])
                off += width
            q = unpack_uintx(shards, nbits, n_last, axis=-1)
            if self.quant_min != 0:
                q = (q.astype(jnp.int32) + self.quant_min).astype(jnp.int8)
            return q
        qd = self.qdata
        if self.nibbles_xored:
            qd = qd ^ jnp.uint8(0x80)
        q = unpack_int4(jnp.swapaxes(qd, -1, -2), axis=-1)
        if self.quant_min != 0:
            q = (q.astype(jnp.int32) + self.quant_min).astype(jnp.int8)
        return q

    def _logical_qparams(self):
        """scale/zero in logical blocked orientation [..., N, K/g]."""
        if self.packing_format is PackingFormat.TILED_NIBBLES:
            zp = (
                None if self.zero_point is None
                else jnp.swapaxes(self.zero_point, -1, -2)
            )
            return jnp.swapaxes(self.scale, -1, -2), zp
        return self.scale, self.zero_point

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        q = self.unpacked_qdata()
        scale, zero_point = self._logical_qparams()
        if self.zero_point_domain is ZeroPointDomain.FLOAT:
            return qp.dequantize_affine_tinygemm(
                q.astype(output_dtype), self.block_size, scale,
                zero_point, None, self.quant_min, self.quant_max,
                output_dtype=output_dtype,
            )
        if self.zero_point_domain is ZeroPointDomain.NONE:
            return qp.dequantize_affine_no_zero_point(
                q, self.block_size, scale, output_dtype=output_dtype
            )
        return qp.dequantize_affine(
            q, self.block_size, scale, zero_point,
            output_dtype=output_dtype,
        )
