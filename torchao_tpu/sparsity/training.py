"""Runtime semi-structured (2:4) sparse *training*.

Covers the reference's ``torchao/sparsity/training/`` (``autograd.py``
``semi_structured_sparsify``, ``SemiSparseLinear`` /
``swap_linear_with_semi_sparse_linear``): during training the weight is
magnitude-pruned to 2:4 *on every forward* — the mask tracks the live
weights as they move — and the gradient flows only to the kept entries
(pruning is a selection op, so its VJP scatters into the selected
positions).

TPU note: the reference's win is cuSPARSELt 2:4 tensor-core matmuls;
TPUs have no sparse MXU, so here runtime pruning is about training
*numerics* (a model that will deploy 2:4-sparse learns under the mask
it will serve with; see ``sparse_api.SemiSparseWeightConfig`` for
deploy-time pruning). The mask computation itself is cheap VPU work
fused by XLA into the matmul's prologue.

``SemiSparseTrainingWeight`` is a pytree wrapper dispatched by
``ops.linear`` — the analog of ``swap_linear_with_semi_sparse_linear``:
wrap the chosen weights, train with the normal jax.grad loop, unwrap
(or ``sparsify_``) for deployment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchao_tpu.qtypes.base import QuantizedArray, qarray_dataclass
from torchao_tpu.sparsity.sparse_api import semi_sparse_mask_2_4


@jax.custom_vjp
def semi_structured_sparsify(w: jnp.ndarray) -> jnp.ndarray:
    """Runtime 2:4 magnitude pruning (reference ``autograd.py``
    ``semi_structured_sparsify``): keep the 2 largest-|w| of every 4
    along the last axis; gradients flow to the kept entries only."""
    return w * semi_sparse_mask_2_4(w).astype(w.dtype)


def _sp_fwd(w):
    mask = semi_sparse_mask_2_4(w)
    return w * mask.astype(w.dtype), mask


def _sp_bwd(mask, g):
    return (g * mask.astype(g.dtype),)


semi_structured_sparsify.defvjp(_sp_fwd, _sp_bwd)


@qarray_dataclass
class SemiSparseTrainingWeight(QuantizedArray):
    """Trainable weight that is 2:4-pruned at run time on every use."""

    weight: jnp.ndarray

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def sparsified(self) -> jnp.ndarray:
        return semi_structured_sparsify(self.weight)

    def dequantize(self, output_dtype=None):
        w = self.sparsified()
        return w if output_dtype is None else w.astype(output_dtype)


def swap_linear_with_semi_sparse_linear(params, filter_fn):
    """Wrap selected 2-D weights for runtime-2:4 training (reference
    ``sparse_api.py`` same-named function). ``filter_fn(path, leaf)``."""
    from torchao_tpu.quantization.quant_api import _path_str

    def transform(key_path, leaf):
        path = _path_str(key_path)
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] % 4 == 0
            and filter_fn(path, leaf)
        ):
            return SemiSparseTrainingWeight(weight=leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(
        transform,
        params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )


def unwrap_semi_sparse(params, prune: bool = True):
    """End of training: either bake the final 2:4 mask in (``prune=True``,
    ready for ``quantize_``/deployment) or recover the dense weight."""

    def fix(leaf):
        if isinstance(leaf, SemiSparseTrainingWeight):
            return leaf.sparsified() if prune else leaf.weight
        return leaf

    return jax.tree_util.tree_map(
        fix, params,
        is_leaf=lambda l: isinstance(l, SemiSparseTrainingWeight),
    )


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(n == "semi_sparse_training" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, SemiSparseTrainingWeight)

    def impl(x, w, bias, preference):
        out = jnp.matmul(x, w.sparsified().T)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("semi_sparse_training", check, impl)


_register_dispatch()
