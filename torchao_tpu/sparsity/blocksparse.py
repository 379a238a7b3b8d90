"""Compressed block-sparse (BSR) weights with a sparse matmul path.

Covers the reference's ``torchao/sparsity/blocksparse.py``
(``BlockSparseTensor`` + its ``bsr_dense_addmm`` Triton path). The
reference stores torch BSR (crow/col/values) and dispatches to a Triton
block-sparse GEMM; the TPU-native equivalent keeps the same compressed
representation but maps the compute to gather + batched-matmul +
segment-sum — every shape static (nnz fixed at conversion), everything
jit-able, FLOPs and weight bytes proportional to ``nnz`` rather than
``N·K``:

    out[:, r] = Σ_{k : row_id[k]=r}  x_blocks[:, col_idx[k]] @ vals[k]ᵀ

- ``vals [nnz, bs, bs]``: the surviving weight blocks (the only large
  array — the HBM win at decode is exactly the sparsity ratio);
- ``col_idx [nnz]``: K-block column of each block;
- ``row_id [nnz]``: N-block row of each block (expanded CSR indptr —
  segment-sum form suits XLA better than a row-pointer loop).

Conversion is host-side numpy: nnz is data-dependent, i.e. a
recompile boundary, exactly like the reference's ``from_dense``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)


@qarray_dataclass
class BlockSparseArray(QuantizedArray):
    vals: jnp.ndarray     # [nnz, bs, bs]
    col_idx: jnp.ndarray  # [nnz] int32 — K-block index
    row_id: jnp.ndarray   # [nnz] int32 — N-block index (sorted)
    dense_shape: Tuple[int, int] = static_field(default=(0, 0))
    blocksize: int = static_field(default=64)
    orig_dtype: str = static_field(default="bfloat16")

    @property
    def shape(self):
        return self.dense_shape

    @property
    def dtype(self):
        return jnp.dtype(self.orig_dtype)

    @property
    def nnz_blocks(self) -> int:
        return self.vals.shape[0]

    def dequantize(self, output_dtype=None):
        N, K = self.dense_shape
        bs = self.blocksize
        out = jnp.zeros((N // bs, K // bs, bs, bs), self.vals.dtype)
        out = out.at[self.row_id, self.col_idx].set(self.vals)
        w = out.transpose(0, 2, 1, 3).reshape(N, K)
        return w.astype(output_dtype or self.dtype)


def bsr_linear(x: jnp.ndarray, w: BlockSparseArray) -> jnp.ndarray:
    """x [.., K] @ Wᵀ for BSR W [N, K] — gather/batched-matmul/segment-sum
    (the XLA lowering keeps only nnz·bs² weight bytes in flight)."""
    N, K = w.dense_shape
    bs = w.blocksize
    xb = x.reshape(-1, K // bs, bs)
    xg = xb[:, w.col_idx]                         # [M, nnz, bs]
    # out_block[m, k, a] = Σ_b xg[m, k, b] · vals[k, a, b]
    prod = jnp.einsum(
        "mkb,kab->kma", xg, w.vals.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    summed = jax.ops.segment_sum(
        prod, w.row_id, num_segments=N // bs
    )                                             # [N/bs, M, bs]
    out = summed.transpose(1, 0, 2).reshape(-1, N)
    return out.astype(x.dtype).reshape(x.shape[:-1] + (N,))


def from_dense(
    w,
    blocksize: int = 64,
    target_sparsity: Optional[float] = 0.9,
    threshold: Optional[float] = None,
) -> BlockSparseArray:
    """Keep the highest-Frobenius-norm blocks: either the top
    ``1 − target_sparsity`` fraction, or all blocks with mean-square
    above ``threshold``. Host-side (sets the static nnz)."""
    wn = np.asarray(w, dtype=np.float32)
    N, K = wn.shape
    assert N % blocksize == 0 and K % blocksize == 0, (wn.shape, blocksize)
    bs = blocksize
    blocks = wn.reshape(N // bs, bs, K // bs, bs).transpose(0, 2, 1, 3)
    norms = (blocks**2).mean(axis=(-2, -1))
    if threshold is not None:
        keep = norms > threshold
    else:
        nb = norms.size
        k_keep = max(1, int(round(nb * (1.0 - target_sparsity))))
        cut = np.sort(norms.reshape(-1))[-k_keep]
        keep = norms >= cut
    row_id, col_idx = np.nonzero(keep)  # row-major → row_id sorted
    vals = blocks[row_id, col_idx]
    return BlockSparseArray(
        vals=jnp.asarray(vals, w.dtype),
        col_idx=jnp.asarray(col_idx, jnp.int32),
        row_id=jnp.asarray(row_id, jnp.int32),
        dense_shape=(N, K),
        blocksize=bs,
        orig_dtype=str(jnp.asarray(w).dtype),
    )


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(n == "block_sparse" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, BlockSparseArray)

    def impl(x, w, bias, preference):
        out = bsr_linear(x, w)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("block_sparse", check, impl)


_register_dispatch()
