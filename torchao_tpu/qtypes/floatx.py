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

from typing import Optional, Tuple

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
