"""NF4Array — 4-bit NormalFloat (QLoRA) with double-quantized scalers.

Covers the reference's ``torchao/dtypes/nf4tensor.py:564`` (NF4Tensor +
``linear_nf4:1037``): weights in blocks of ``block_size`` share an absmax
scaler; values snap to the 16-entry NF4 codebook (quantiles of a standard
normal); the per-block scalers are themselves int8-quantized in groups of
``scaler_block_size`` around their mean (double quantization).

Storage: packed nibbles (2 codes/byte via the shared half-split packing)
+ int8 quantized scalers + per-group scaler scales + the global mean.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.qtypes.packing import pack_int4, unpack_int4

# NF4 code values: quantiles of N(0,1) normalized to [-1, 1] (QLoRA,
# Dettmers et al. 2023 — public constants)
NF4_CODES = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367,
        -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
        -0.09105003625154495, 0.0, 0.07958029955625534,
        0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
        0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
    ],
    np.float32,
)


@qarray_dataclass
class NF4Array(QuantizedArray):
    qdata: jnp.ndarray             # packed nibble codes [n_elem/2] uint8
    quantized_scalers: jnp.ndarray  # int8 [n_blocks]
    quantization_factor: jnp.ndarray  # f32 [n_scaler_groups]
    scaler_mean: jnp.ndarray       # f32 scalar
    block_size: int = static_field(default=64)
    scaler_block_size: int = static_field(default=256)
    logical_shape: Tuple[int, ...] = static_field(default=None)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return tuple(self.logical_shape)

    @classmethod
    def from_hp(
        cls, w: jnp.ndarray, block_size: int = 64,
        scaler_block_size: int = 256,
    ) -> "NF4Array":
        shape = tuple(w.shape)
        flat = w.astype(jnp.float32).reshape(-1)
        n = flat.shape[0]
        assert n % block_size == 0, (n, block_size)
        blocks = flat.reshape(-1, block_size)
        scalers = jnp.max(jnp.abs(blocks), axis=1)
        scalers = jnp.maximum(scalers, 1e-12)

        # double quantization of scalers (reference
        # double_quantize_scalers): subtract mean, absmax int8 per group
        nb = scalers.shape[0]
        sbs = min(scaler_block_size, nb)
        while nb % sbs:
            sbs -= 1
        mean = jnp.mean(scalers)
        centered = (scalers - mean).reshape(-1, sbs)
        qf = jnp.max(jnp.abs(centered), axis=1) / 127.0
        qf = jnp.maximum(qf, 1e-12)
        qs = jnp.clip(
            jnp.round(centered / qf[:, None]), -127, 127
        ).astype(jnp.int8).reshape(-1)

        # codebook assignment (bucketize against midpoints)
        codes = jnp.asarray(NF4_CODES)
        mids = (codes[1:] + codes[:-1]) / 2
        normed = blocks / scalers[:, None]
        idx = jnp.searchsorted(mids, normed.reshape(-1)).astype(jnp.uint8)
        packed = pack_int4(idx.reshape(1, -1), axis=-1)[0]

        return cls(
            qdata=packed,
            quantized_scalers=qs,
            quantization_factor=qf,
            scaler_mean=mean,
            block_size=block_size,
            scaler_block_size=sbs,
            logical_shape=shape,
            activation_dtype=str(jnp.dtype(w.dtype)),
        )

    def _scalers(self) -> jnp.ndarray:
        qs = self.quantized_scalers.astype(jnp.float32).reshape(
            -1, self.scaler_block_size
        )
        return (
            qs * self.quantization_factor[:, None] + self.scaler_mean
        ).reshape(-1)

    def dequantize(self, output_dtype=None) -> jnp.ndarray:
        if output_dtype is None:
            output_dtype = self.dtype
        idx = unpack_int4(self.qdata[None, :], axis=-1)[0].astype(jnp.int32)
        vals = jnp.asarray(NF4_CODES)[idx]
        scalers = self._scalers()
        out = (
            vals.reshape(-1, self.block_size) * scalers[:, None]
        ).reshape(self.logical_shape)
        return out.astype(output_dtype)


def linear_nf4(x: jnp.ndarray, w: NF4Array) -> jnp.ndarray:
    """``x @ dequant(w).T`` (reference ``linear_nf4``; gradients flow to
    ``x`` only — the NF4 weight is frozen in QLoRA)."""
    wd = jax.lax.stop_gradient(w.dequantize(x.dtype))
    return jnp.matmul(x, wd.T)


def to_nf4(w: jnp.ndarray, block_size: int = 64,
           scaler_block_size: int = 256) -> NF4Array:
    return NF4Array.from_hp(w, block_size, scaler_block_size)
