"""Flax (linen/nnx) interoperability.

The reference plugs into HF Transformers / vLLM via tensor-subclass
weights inside nn.Modules. The JAX ecosystem's module libraries keep
params in a variables pytree, so interop is a params transform plus a
drop-in Dense:

- :func:`quantize_flax_params` — quantize ``...kernel`` leaves of a linen
  variables dict. Linen stores kernels **[in_features, out_features]**
  (transposed vs this library's torch-convention [out, in]); the kernels
  are transposed into torch convention at quantization time so block
  sizes/granularities mean the same thing everywhere.
- :class:`QuantizedDense` — a linen module that consumes such quantized
  kernels via ``ops.linear`` (use in place of ``nn.Dense`` when building
  models that should run quantized weights).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import QuantizedArray
from torchao_tpu.quantization.transform_module import get_quantize_handler


def quantize_flax_params(
    variables: Any,
    config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Any:
    """Quantize linen kernel leaves (paths ending in ``kernel``).

    Kernels are transposed [in, out] → [out, in] before the handler so the
    reference block-size semantics (groups along in-features) hold; the
    resulting QuantizedArray stays in torch convention and is consumed by
    :class:`QuantizedDense` / ``ops.linear``.
    """
    from torchao_tpu.quantization.quant_api import _path_str

    def default_filter(path: str, leaf) -> bool:
        return (
            path.endswith("kernel")
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    if filter_fn is None:
        filter_fn = default_filter

    def transform(kp, leaf):
        path = _path_str(kp)
        if not filter_fn(path, leaf):
            return leaf
        qw = get_quantize_handler(config)(leaf.T, config)
        return qw if not isinstance(qw, jnp.ndarray) else leaf

    return jax.tree_util.tree_map_with_path(
        transform, variables,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )


try:
    import flax.linen as nn

    class QuantizedDense(nn.Module):
        """Drop-in ``nn.Dense`` that also accepts quantized kernels.

        Initializes a standard [in, out] kernel; at apply time a kernel
        that has been replaced by a QuantizedArray (torch-convention
        [out, in], via :func:`quantize_flax_params`) routes through the
        qlinear dispatch.
        """

        features: int
        use_bias: bool = True
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            # a quantized kernel ([out, in] torch convention) bypasses
            # linen's param shape validation (it was [in, out] at init)
            existing = (
                self.scope.get_variable("params", "kernel")
                if self.has_variable("params", "kernel")
                else None
            )
            if isinstance(existing, QuantizedArray):
                kernel = existing
            else:
                kernel = self.param(
                    "kernel",
                    nn.initializers.lecun_normal(),
                    (x.shape[-1], self.features),
                    self.dtype,
                )
            bias = (
                self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    self.dtype,
                )
                if self.use_bias
                else None
            )
            if isinstance(kernel, QuantizedArray):
                return ops.linear(x, kernel, bias)
            out = jnp.matmul(x, kernel)
            return out + bias if bias is not None else out

except ImportError:  # pragma: no cover
    QuantizedDense = None
