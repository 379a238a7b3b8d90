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


# ---------------------------------------------------------------------------
# Variant 2: block (vector) codebooks — reference ``codebook/codebook_ops.py``
# quantize_codebook with codebook shape (2^nbits, *block_size): one code
# indexes a VECTOR of weights (e.g. (1, 2) blocks), k-means in R^blocksize.
# ---------------------------------------------------------------------------


@qarray_dataclass
class BlockCodebookQuantizedArray(QuantizedArray):
    indices: jnp.ndarray    # uint8/uint16 [N, K/bs]
    codebook: jnp.ndarray   # [2^nbits, bs] f32
    scale: jnp.ndarray      # [N, 1] per-channel
    nbits: int = static_field(default=4)
    block_len: int = static_field(default=2)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return (
            self.indices.shape[0],
            self.indices.shape[1] * self.block_len,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.activation_dtype)

    def dequantize(self, output_dtype=None):
        if output_dtype is None:
            output_dtype = self.dtype
        vals = self.codebook[self.indices.astype(jnp.int32)]  # [N,K/bs,bs]
        vals = vals.reshape(self.shape)
        return (vals * self.scale.astype(jnp.float32)).astype(output_dtype)


def _kmeans_nd(x: jnp.ndarray, k: int, iters: int = 10) -> jnp.ndarray:
    """Lloyd's algorithm on R^d vectors; init = evenly spaced samples of
    the magnitude-sorted data (spread over the radius distribution)."""
    order = jnp.argsort(jnp.linalg.norm(x, axis=1))
    init = x[order[jnp.linspace(0, x.shape[0] - 1, k).astype(jnp.int32)]]

    def step(centers, _):
        d = jnp.sum(
            (x[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = one_hot.sum(0)
        sums = jnp.einsum("nk,nd->kd", one_hot, x)
        new = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1)[:, None],
            centers,
        )
        return new, None

    centers, _ = jax.lax.scan(step, init, None, length=iters)
    return centers


@dataclasses.dataclass
class BlockCodebookWeightOnlyConfig(AOBaseConfig):
    """Vector-quantization codebook: ``block_len`` weights per code
    (reference codebook block_size=(1, block_len)); nbits bits per CODE,
    so bits/weight = nbits / block_len."""

    dtype_nbits: int = 8
    block_len: int = 2
    kmeans_iters: int = 10
    sample_size: int = 32768
    version: int = 1


@register_quantize_module_handler(BlockCodebookWeightOnlyConfig)
def _block_codebook_transform(w, config: BlockCodebookWeightOnlyConfig):
    if w.ndim != 2 or w.shape[1] % config.block_len != 0:
        return w
    k = 2 ** config.dtype_nbits
    bs = config.block_len
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1, keepdims=True), 1e-12)
    normed = (w32 / scale).reshape(-1, bs)
    sample = normed[:: max(1, normed.shape[0] // config.sample_size)]
    codebook = _kmeans_nd(sample, k, config.kmeans_iters)
    d = jnp.sum(
        (normed[:, None, :] - codebook[None, :, :]) ** 2, axis=-1
    )
    idx = jnp.argmin(d, axis=1).astype(
        jnp.uint8 if config.dtype_nbits <= 8 else jnp.uint16
    )
    return BlockCodebookQuantizedArray(
        indices=idx.reshape(w.shape[0], w.shape[1] // bs),
        codebook=codebook,
        scale=scale,
        nbits=config.dtype_nbits,
        block_len=bs,
        activation_dtype=str(jnp.dtype(w.dtype)),
    )


# ---------------------------------------------------------------------------
# Variant 3: groupwise LUTs — reference ``codebook_coreml`` (one lookup
# table per row group) / ``codebook_groupwise`` (GroupwiseLutWeightConfig):
# heterogeneous rows get their own codebooks.
# ---------------------------------------------------------------------------


@qarray_dataclass
class GroupwiseLutQuantizedArray(QuantizedArray):
    indices: jnp.ndarray    # uint8 [N, K]
    luts: jnp.ndarray       # [G, 2^nbits] f32 — one LUT per row group
    scale: jnp.ndarray      # [N, 1] per-channel
    nbits: int = static_field(default=4)
    rows_per_group: int = static_field(default=0)
    activation_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return self.indices.shape

    @property
    def dtype(self):
        return jnp.dtype(self.activation_dtype)

    def dequantize(self, output_dtype=None):
        if output_dtype is None:
            output_dtype = self.dtype
        N = self.indices.shape[0]
        g = jnp.arange(N) // self.rows_per_group          # [N]
        vals = jnp.take_along_axis(
            self.luts[g],                                  # [N, 2^nbits]
            self.indices.astype(jnp.int32), axis=1,
        )
        return (vals * self.scale.astype(jnp.float32)).astype(output_dtype)


@dataclasses.dataclass
class GroupwiseLutWeightConfig(AOBaseConfig):
    """One k-means LUT per ``rows_per_group`` out-feature rows
    (reference ``codebook_groupwise/api.py:44`` GroupwiseLutWeightConfig /
    codebook_coreml row grouping)."""

    dtype_nbits: int = 4
    rows_per_group: int = 32
    kmeans_iters: int = 10
    version: int = 1


@register_quantize_module_handler(GroupwiseLutWeightConfig)
def _groupwise_lut_transform(w, config: GroupwiseLutWeightConfig):
    if w.ndim != 2 or w.shape[0] % config.rows_per_group != 0:
        return w
    k = 2 ** config.dtype_nbits
    rpg = config.rows_per_group
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1, keepdims=True), 1e-12)
    normed = w32 / scale
    groups = normed.reshape(w.shape[0] // rpg, -1)        # [G, rpg*K]

    def one_group(flat):
        cb = _kmeans_1d(flat, k, config.kmeans_iters)
        d = jnp.abs(flat[:, None] - cb[None, :])
        return cb, jnp.argmin(d, axis=1)

    luts, idx = jax.lax.map(one_group, groups)
    return GroupwiseLutQuantizedArray(
        indices=idx.reshape(w.shape).astype(
            jnp.uint8 if config.dtype_nbits <= 8 else jnp.uint16
        ),
        luts=luts,
        scale=scale,
        nbits=config.dtype_nbits,
        rows_per_group=rpg,
        activation_dtype=str(jnp.dtype(w.dtype)),
    )
