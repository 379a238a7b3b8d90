"""Codebook (k-means) weight quantization.

Covers the reference's ``torchao/prototype/quantization/codebook*``:
per-channel-normalized weights clustered to a 2^nbits-entry codebook via
Lloyd iterations (jnp-native k-means under ``lax.scan``), stored as uint8
indices + per-channel scales + the codebook. The TPU dequant is a VMEM
table gather — the same LUT-GEMM idea as the reference's groupwise-LUT
ARM kernels (SURVEY.md §2.7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization.transform_module import (
    register_quantize_module_handler,
)


@qarray_dataclass
class CodebookQuantizedArray(QuantizedArray):
    indices: jnp.ndarray    # uint8/uint16 [N, K]
    codebook: jnp.ndarray   # [2^nbits] f32
    scale: jnp.ndarray      # [N, 1] per-channel
    nbits: int = static_field(default=4)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return self.indices.shape

    def dequantize(self, output_dtype=None):
        if output_dtype is None:
            output_dtype = self.dtype
        vals = self.codebook[self.indices.astype(jnp.int32)]
        return (vals * self.scale.astype(jnp.float32)).astype(output_dtype)


def _kmeans_1d(x: jnp.ndarray, k: int, iters: int = 10) -> jnp.ndarray:
    """Lloyd's algorithm on scalars; init = quantiles."""
    qs = jnp.quantile(x, jnp.linspace(0.005, 0.995, k))

    def step(centers, _):
        d = jnp.abs(x[:, None] - centers[None, :])
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = one_hot.sum(0)
        sums = (one_hot * x[:, None]).sum(0)
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, qs, None, length=iters)
    return jnp.sort(centers)


@dataclasses.dataclass
class CodebookWeightOnlyConfig(AOBaseConfig):
    dtype_nbits: int = 4
    kmeans_iters: int = 10
    sample_size: int = 65536
    version: int = 1


@register_quantize_module_handler(CodebookWeightOnlyConfig)
def _codebook_transform(w, config: CodebookWeightOnlyConfig):
    if w.ndim != 2:
        return w
    k = 2 ** config.dtype_nbits
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=1, keepdims=True)
    scale = jnp.maximum(scale, 1e-12)
    normed = (w32 / scale).reshape(-1)
    sample = normed[:: max(1, normed.size // config.sample_size)]
    codebook = _kmeans_1d(sample, k, config.kmeans_iters)
    d = jnp.abs(normed[:, None] - codebook[None, :])
    idx = jnp.argmin(d, axis=1).astype(
        jnp.uint8 if config.dtype_nbits <= 8 else jnp.uint16
    )
    return CodebookQuantizedArray(
        indices=idx.reshape(w.shape),
        codebook=codebook,
        scale=scale,
        nbits=config.dtype_nbits,
        activation_dtype=str(jnp.dtype(w.dtype)),
    )
