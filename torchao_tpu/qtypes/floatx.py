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

Decode rides XLA (unpack shards → ``exmy_decode`` → scale); Mosaic
legalizes integer shifts only at i32, so an in-Pallas-kernel fp6 decode
is VPU-bound by ~5× more i32 work per element than the int4 nibble
unpack — the dense int4/int8/fp8 kernels remain the speed frontier on
v5e and floatx is the memory/accuracy point between them (PERF.md).
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

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        shards = [
            s for s in (self.qdata, self.qdata2, self.qdata3)
            if s is not None
        ]
        codes = unpack_uintx(
            shards, self.nbits, self.logical_shape[-1], axis=-1
        )
        values = qp.exmy_decode(codes, self.ebits, self.mbits)
        return qp.dequantize_affine_floatx(
            values, self.scale, self.ebits, self.mbits,
            output_dtype=output_dtype,
        )
