"""Sparsity API.

Mirrors the reference's ``torchao/sparsity/sparse_api.py`` (``sparsify_:97``,
``SemiSparseWeightConfig:73``, ``BlockSparseWeightConfig:50``).

TPU note (SURVEY.md §2.7): there is no sparse MXU, so 2:4 patterns bring
no kernel speedup here — the configs implement the *pruning semantics*
(mask selection identical to the reference: keep the 2 largest |w| of
every 4 along K) so accuracy studies and sparsity+quant composition
(e.g. int8dq + 2:4, the SAM recipe) are reproducible; block-sparse masks
additionally zero whole tiles which XLA's DCE can exploit when blocks are
large.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)


@dataclasses.dataclass
class SemiSparseWeightConfig(AOBaseConfig):
    """2:4 semi-structured sparsity along the in-features axis."""

    version: int = 1


@dataclasses.dataclass
class BlockSparseWeightConfig(AOBaseConfig):
    """``compressed=False`` only zeroes pruned tiles (mask semantics);
    ``compressed=True`` converts to a BSR ``BlockSparseArray`` whose
    matmul reads and computes only the surviving blocks (the analog of
    the reference's ``BlockSparseTensor`` conversion)."""

    blocksize: int = 64
    target_sparsity: float = 0.9
    compressed: bool = False
    version: int = 1


def semi_sparse_mask_2_4(w: jnp.ndarray) -> jnp.ndarray:
    """Keep the 2 largest-|w| of each contiguous 4 along the last axis."""
    K = w.shape[-1]
    assert K % 4 == 0, K
    g = jnp.abs(w).reshape(*w.shape[:-1], K // 4, 4)
    # rank within each group; keep top-2
    order = jnp.argsort(g, axis=-1)  # ascending
    ranks = jnp.argsort(order, axis=-1)
    mask = (ranks >= 2).reshape(w.shape)
    return mask


@register_quantize_module_handler(SemiSparseWeightConfig)
def _semi_sparse_transform(w, config: SemiSparseWeightConfig):
    if w.shape[-1] % 4 != 0:
        return w
    return w * semi_sparse_mask_2_4(w).astype(w.dtype)


@register_quantize_module_handler(BlockSparseWeightConfig)
def _block_sparse_transform(w, config: BlockSparseWeightConfig):
    bs = config.blocksize
    N, K = w.shape[-2], w.shape[-1]
    if N % bs or K % bs:
        return w
    if config.compressed and w.ndim == 2:
        from torchao_tpu.sparsity.blocksparse import from_dense

        return from_dense(
            w, blocksize=bs, target_sparsity=config.target_sparsity
        )
    blocks = w.reshape(*w.shape[:-2], N // bs, bs, K // bs, bs)
    norms = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=(-3, -1))
    flat = norms.reshape(*norms.shape[:-2], -1)
    k_keep = max(1, int(flat.shape[-1] * (1 - config.target_sparsity)))
    thresh = jnp.sort(flat, axis=-1)[..., -k_keep][..., None, None]
    keep = (norms >= thresh)[..., :, None, :, None]
    return (blocks * keep).reshape(w.shape).astype(w.dtype)


def apply_fake_sparsity(w: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-based 2:4 pruning (the reference's ``apply_fake_sparsity``
    used before quantization in the SAM recipe)."""
    return w * semi_sparse_mask_2_4(w).astype(w.dtype)


def sparsify_(
    params,
    config: AOBaseConfig,
    filter_fn: Optional[Callable] = None,
):
    """Apply a sparsity config over a params pytree (reference
    ``sparsify_``, ``sparse_api.py:97``). Composes with ``quantize_``:
    sparsify first, then quantize."""
    from torchao_tpu.quantization.quant_api import quantize_

    return quantize_(params, config, filter_fn)
