"""FloatxArray — sub-byte ExMy float weights (fp6-LLM family), bit-packed.

Covers the reference's floatx tensor-core layout
(``torchao/dtypes/floatx/floatx_tensor_core_layout.py:457``) and the
memory story of its fp6-LLM CUDA kernels (``csrc/cuda/fp6_llm/``,
1,354 LoC): each element stores as a (1+ebits+mbits)-bit code with
per-row power-of-two scales, so an fp6 model is 6/16 the bytes of bf16.
The packing is TPU-first — power-of-2 bit shards along K
(``qtypes.packing.pack_uintx``: fp6 → a 4-bit shard + a 2-bit shard)
instead of the GPU's tensor-core bit-interleave; numerics match the
reference's quant-LLM grid exactly (``quant_primitives.py:2114-2172``).

fp6 (e3m2) additionally stores K-MAJOR when eligible (``kmajor=True``:
qdata = half-split 4-bit shard [K/2, N], qdata2 = quarter-split 2-bit
shard [K/4, N]) so the fused Pallas decode kernel
(``kernels/fp6_matmul.py``) streams it directly: every fp6 value ×32 is
a ≤3-significant-bit integer, so the in-kernel decode is a short
shift-free bf16 sequence (Mosaic legalizes integer shifts only at i32 —
the kernel never shifts). Other widths ride XLA (unpack shards →
``exmy_decode`` → scale).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.qtypes.packing import pack_uintx, unpack_uintx
from torchao_tpu.quantization import quant_primitives as qp


@qarray_dataclass
class FloatxArray(QuantizedArray):
    qdata: jnp.ndarray                      # first (widest) bit shard
    scale: jnp.ndarray                      # per-row power-of-two scale
    qdata2: Optional[jnp.ndarray] = None    # second shard (fp3/5/6/7)
    qdata3: Optional[jnp.ndarray] = None    # third shard (fp7)
    ebits: int = static_field(default=3)
    mbits: int = static_field(default=2)
    logical_shape: Tuple[int, ...] = static_field(default=())
    activation_dtype: str = static_field(default="bfloat16")
    # fp6-only: qdata/qdata2 are the K-major kernel shards
    # (kernels/fp6_matmul.py pack_fp6_kmajor) instead of axis=-1 uintx
    # shards; enables the fused Pallas decode kernel
    kmajor: bool = static_field(default=False)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.logical_shape)

    @property
    def nbits(self) -> int:
        return 1 + self.ebits + self.mbits

    @classmethod
    def from_hp(cls, w: jnp.ndarray, ebits: int, mbits: int) -> "FloatxArray":
        scale = qp.choose_qparams_affine_floatx(w, ebits, mbits)
        grid = qp.quantize_affine_floatx(w, scale, ebits, mbits)
        codes = qp.exmy_encode(grid, ebits, mbits)
        K = w.shape[-1]
        if ebits == 3 and mbits == 2 and K % 8 == 0:
            from torchao_tpu.kernels.fp6_matmul import pack_fp6_kmajor

            if w.ndim == 2:
                s4, s2 = pack_fp6_kmajor(codes)
            else:  # stacked [L, N, K]
                import jax as _jax

                s4, s2 = _jax.vmap(pack_fp6_kmajor)(codes)
            return cls(
                qdata=s4,
                scale=scale,
                qdata2=s2,
                qdata3=None,
                ebits=ebits,
                mbits=mbits,
                logical_shape=tuple(w.shape),
                activation_dtype=str(jnp.dtype(w.dtype)),
                kmajor=True,
            )
        shards = pack_uintx(codes, 1 + ebits + mbits, axis=-1)
        shards = tuple(shards) + (None,) * (3 - len(shards))
        return cls(
            qdata=shards[0],
            scale=scale,
            qdata2=shards[1],
            qdata3=shards[2],
            ebits=ebits,
            mbits=mbits,
            logical_shape=tuple(w.shape),
            activation_dtype=str(jnp.dtype(w.dtype)),
        )

    # --- slicing (TP / merged-projection init) --------------------------
    def slice_out_features(self, start: int, size: int) -> "FloatxArray":
        """Logical slice along out-features (kmajor layout: N is the
        LAST axis of every leaf)."""
        import dataclasses as _dc

        assert self.kmajor, "sliceable only in the kmajor layout"
        ls = list(self.shape)
        ls[-2] = size
        return _dc.replace(
            self,
            qdata=self.qdata[..., start:start + size],
            qdata2=self.qdata2[..., start:start + size],
            scale=self.scale[..., start:start + size],
            logical_shape=tuple(ls),
        )

    @classmethod
    def concat_out_features(cls, parts) -> "FloatxArray":
        import dataclasses as _dc

        a = parts[0]
        assert all(p.kmajor for p in parts)
        ls = list(a.shape)
        ls[-2] = sum(p.shape[-2] for p in parts)
        return _dc.replace(
            a,
            qdata=jnp.concatenate([p.qdata for p in parts], axis=-1),
            qdata2=jnp.concatenate([p.qdata2 for p in parts], axis=-1),
            scale=jnp.concatenate([p.scale for p in parts], axis=-1),
            logical_shape=tuple(ls),
        )

    def _codes(self) -> jnp.ndarray:
        """uint8 ExMy codes in logical [.., N, K] orientation."""
        if self.kmajor:
            s4, s2 = self.qdata, self.qdata2
            f4 = jnp.concatenate([s4 & 0xF, s4 >> 4], axis=-2)
            f2 = jnp.concatenate(
                [(s2 >> (2 * q)) & 3 for q in range(4)], axis=-2
            )  # [.., K, N]: e2 | s<<1
            codes = (
                (f4 & 3)                                   # m
                | (((f4 >> 2) & 3) << 2)                   # e_lo2
                | ((f2 & 1).astype(jnp.uint8) << 4)        # e_hi
                | ((f2 >> 1).astype(jnp.uint8) << 5)       # sign
            )
            return jnp.swapaxes(codes, -1, -2)
        shards = [
            s for s in (self.qdata, self.qdata2, self.qdata3)
            if s is not None
        ]
        return unpack_uintx(
            shards, self.nbits, self.logical_shape[-1], axis=-1
        )

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        values = qp.exmy_decode(self._codes(), self.ebits, self.mbits)
        return qp.dequantize_affine_floatx(
            values, self.scale, self.ebits, self.mbits,
            output_dtype=output_dtype,
        )

    def to_dual_planes(self, group_size: int = 128) -> "Fp6DualArray":
        """EXACT fp6 → dual-plane serving form (fp6 e3m2 only).

        Every fp6 grid value ×32 is an integer v ∈ [−896, 896], so
        ``v = A + 16·B`` with A ∈ [−8, 8) (a NIBBLE) and B ∈ [−56, 56]
        (int8) — and ``x·w = (x@A)·s/32 + (x@B)·s/2`` is two native MXU
        dots through the EXISTING int4 and int8 kernel paths with zero
        per-element decode. 1.5 B/elem streamed. Round-3 hardware bisect
        (PERF.md): any exact in-kernel 6-bit decode is VPU-rate-bound
        (~2 µs per M-element bf16 op, ≥12-op floor → ≤~30 GB/s effective)
        — this layout is the throughput-true fp6 decode path on TPU; the
        6-bit shards remain the at-rest storage format."""
        assert self.ebits == 3 and self.mbits == 2, "fp6 only"
        from torchao_tpu.qtypes.intx import (
            IntxArray,
            _tiled_eff_qparams_chunked,
        )
        from torchao_tpu.qtypes.packing import pack_int4
        from torchao_tpu.qtypes.base import PackingFormat
        from torchao_tpu.quantization.quant_primitives import (
            ZeroPointDomain,
        )

        codes = self._codes()                       # [.., N, K]
        c = codes.astype(jnp.int32)
        m = (c & 3).astype(jnp.float32)
        e = (c >> 2) & 7
        sg = 1.0 - 2.0 * ((c >> 5) & 1).astype(jnp.float32)
        nz = (e > 0).astype(jnp.float32)
        v32 = (
            (2.0 * m + (4.0 - m) * nz)
            * jnp.exp2(e.astype(jnp.float32)) * sg
        ).astype(jnp.int32)
        a = ((v32 + 8) & 15) - 8                    # [−8, 8)
        b = ((v32 - a) >> 4).astype(jnp.int8)       # [−56, 56]

        *lead, N, K = codes.shape
        g = min(group_size, K)
        srow = self.scale.astype(jnp.float32)       # [.., N] power of 2

        # A-plane: tinygemm-form TILED nibbles (q = A+8, mid = 8,
        # z = 0) with the per-row scale replicated per K-group — rides
        # the batched-int4 decode kernel unchanged
        qd = pack_int4((a + 8).astype(jnp.uint8), axis=-1)
        qd = (qd ^ jnp.uint8(0x80))
        qd = jnp.swapaxes(qd, -1, -2)               # [.., K/2, N]
        # per-row scale replicated per K-group; symmetric form
        # (zero_point=None: nib = A+8 -> dq = (nib-8)*s, the int4
        # kernel's mid=8 symmetric case) keeps qparam overhead at
        # ~10 bytes per g elements
        a_scale = jnp.broadcast_to(
            (srow / 32.0)[..., None, :],
            tuple(lead) + (K // g, N),
        ).astype(jnp.bfloat16)
        qeff, qchunk = _tiled_eff_qparams_chunked(
            a_scale, None, 0, 15, ZeroPointDomain.FLOAT, g
        )
        a_plane = IntxArray(
            qdata=qd,
            scale=a_scale,
            zero_point=None,
            block_size=(1,) * (len(lead) + 1) + (g,),
            target_dtype="int4",
            quant_min=0,
            quant_max=15,
            zero_point_domain=ZeroPointDomain.FLOAT,
            packing_format=PackingFormat.TILED_NIBBLES,
            logical_shape=tuple(lead) + (N, K),
            activation_dtype=self.activation_dtype,
            qparams_eff=qeff,
            qparams_eff_chunk=qchunk,
            nibbles_xored=True,
        )
        # B-plane: PLAIN int8 with per-channel scale 16·s/32 = s/2
        b_plane = IntxArray(
            qdata=b,
            scale=(srow / 2.0)[..., None],
            zero_point=None,
            block_size=(1,) * (len(lead) + 1) + (K,),
            target_dtype="int8",
            quant_min=-128,
            quant_max=127,
            zero_point_domain=ZeroPointDomain.NONE,
            logical_shape=tuple(lead) + (N, K),
            activation_dtype=self.activation_dtype,
        )
        return Fp6DualArray(
            a_plane=a_plane,
            b_plane=b_plane,
            logical_shape=tuple(lead) + (N, K),
            activation_dtype=self.activation_dtype,
        )


@qarray_dataclass
class Fp6DualArray(QuantizedArray):
    """fp6 weights in the dual-plane serving layout (see
    ``FloatxArray.to_dual_planes``): a TILED-nibble low plane + an int8
    high plane whose dots sum to the EXACT fp6 (quant-LLM grid) matmul,
    each plane riding its existing Pallas kernel path."""

    a_plane: Any                          # IntxArray (TILED_NIBBLES)
    b_plane: Any                          # IntxArray (PLAIN int8)
    logical_shape: Tuple[int, ...] = static_field(default=())
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.logical_shape)

    @property
    def dtype(self):
        return jnp.dtype(self.activation_dtype)

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        return (
            self.a_plane.dequantize(jnp.float32)
            + self.b_plane.dequantize(jnp.float32)
        ).astype(output_dtype)

    def unstack_layer(self):
        import dataclasses

        return dataclasses.replace(
            self,
            a_plane=self.a_plane.unstack_layer(),
            b_plane=self.b_plane.unstack_layer(),
            logical_shape=tuple(self.logical_shape[1:]),
        )

    def take_layer(self, l):
        import dataclasses

        return dataclasses.replace(
            self,
            a_plane=self.a_plane.take_layer(l),
            b_plane=self.b_plane.take_layer(l),
            logical_shape=tuple(self.logical_shape[1:]),
        )

    def slice_out_features(self, start: int, size: int) -> "Fp6DualArray":
        import dataclasses

        ls = list(self.logical_shape)
        ls[-2] = size
        return dataclasses.replace(
            self,
            a_plane=self.a_plane.slice_out_features(start, size),
            b_plane=self.b_plane.slice_out_features(start, size),
            logical_shape=tuple(ls),
        )

    @classmethod
    def concat_out_features(cls, parts) -> "Fp6DualArray":
        import dataclasses

        from torchao_tpu.qtypes.intx import IntxArray

        a = parts[0]
        ls = list(a.logical_shape)
        ls[-2] = sum(p.logical_shape[-2] for p in parts)
        return dataclasses.replace(
            a,
            a_plane=IntxArray.concat_out_features(
                [p.a_plane for p in parts]
            ),
            b_plane=IntxArray.concat_out_features(
                [p.b_plane for p in parts]
            ),
            logical_shape=tuple(ls),
        )
