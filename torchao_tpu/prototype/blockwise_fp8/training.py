"""DeepSeek-V3-style blockwise fp8 *training*.

Covers the reference's ``torchao/prototype/blockwise_fp8_training``
(``linear.py`` fp8_blockwise_mm + ``kernels.py`` Triton GEMMs): every
matmul of the linear runs with fp8 operands under fine-grained scales —

- activations / gradients: (1, 128) groups along the contracting dim;
- weights: (128, 128) blocks;
- dW's operands: scale groups laid out so they never cross the
  contracting (token) dim — gᵀ gets (1, 128) along M, x gets (128, 1)
  along M (reference ``fp8_blockwise_act_quant_transposed_lhs`` /
  ``_rhs``).

TPU mapping: the reference needs hand-written Triton GEMMs because
per-128-chunk rescale must happen *inside* the accumulation loop on
tensor cores. Dequantize-then-matmul in f32 accumulation is numerically
identical (each product term picks up exactly its two scales), and on
this hardware measurably *faster* than a Pallas fp8 kernel (PERF.md:
XLA's e4m3 convert path 525 GB/s vs 61 GB/s through Pallas) — so the
three GEMMs (out, dx, dW) are XLA dot_generals over dequantized
operands, with the quantize-dequantize pair expressing the fp8
numerics. ``jax.custom_vjp`` plays the role of
``torch.autograd.Function``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

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

_F8_MAX = 448.0  # e4m3fn
_EPS = 1e-12


def _qdq_groups_lastdim(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(1, b) scale groups along the last axis: quantize→dequantize
    through e4m3 (reference ``fp8_blockwise_act_quant_lhs`` numerics)."""
    *lead, K = x.shape
    assert K % b == 0, (x.shape, b)
    xg = x.astype(jnp.float32).reshape(*lead, K // b, b)
    amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / _F8_MAX
    q = (xg / scale).astype(jnp.float8_e4m3fn)
    return (q.astype(jnp.float32) * scale).reshape(x.shape)


def _qdq_blocks_2d(w: jnp.ndarray, b: int) -> jnp.ndarray:
    """(b, b) scale blocks (reference
    ``fp8_blockwise_weight_quant_rhs`` numerics)."""
    N, K = w.shape
    assert N % b == 0 and K % b == 0, (w.shape, b)
    wb = w.astype(jnp.float32).reshape(N // b, b, K // b, b)
    amax = jnp.max(jnp.abs(wb), axis=(1, 3), keepdims=True)
    scale = jnp.maximum(amax, _EPS) / _F8_MAX
    q = (wb / scale).astype(jnp.float8_e4m3fn)
    return (q.astype(jnp.float32) * scale).reshape(N, K)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def blockwise_fp8_linear(
    x: jnp.ndarray, w: jnp.ndarray, block_size: int = 128
) -> jnp.ndarray:
    """out = x @ wᵀ with both operands cast through blockwise fp8."""
    out, _ = _bw_fwd(x, w, block_size)
    return out


def _bw_fwd(x, w, block_size):
    b = block_size
    xs = x.shape
    x2 = x.reshape(-1, xs[-1])
    x_dq = _qdq_groups_lastdim(x2, b)       # (1, b) along K
    w_dq = _qdq_blocks_2d(w, b)             # (b, b)
    out = jax.lax.dot_general(
        x_dq, w_dq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out.reshape(*xs[:-1], w.shape[0]), (x2, w, xs)


def _bw_bwd(block_size, res, g):
    b = block_size
    x2, w, xs = res
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)

    # dx = g @ w : g gets (1, b) along N (its contracting dim), w (b, b)
    g_dq = _qdq_groups_lastdim(g2, b)
    w_dq = _qdq_blocks_2d(w, b)
    dx = jax.lax.dot_general(
        g_dq, w_dq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dW = gᵀ @ x : scale groups must not cross the contracting (M) dim
    # — gᵀ gets (1, b) along M, x gets (b, 1) along M (both are (1, b)
    # along the last axis of the transposed operand).
    M = g2.shape[0]
    if M % b == 0:
        gt_dq = _qdq_groups_lastdim(g2.T, b)        # [N, M], groups on M
        xt_dq = _qdq_groups_lastdim(x2.T, b)        # [K, M], groups on M
        dw = jax.lax.dot_general(
            gt_dq, xt_dq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # token count not a block multiple (the reference asserts it is;
        # we keep training usable on ragged tails with an hp dW)
        dw = jax.lax.dot_general(
            g2, x2.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return dx.reshape(xs).astype(x2.dtype), dw.astype(w.dtype)


blockwise_fp8_linear.defvjp(_bw_fwd, _bw_bwd)


# ---------------------------------------------------------------------------
# param-tree wrapper (the Float8BlockwiseLinear module swap)
# ---------------------------------------------------------------------------


@qarray_dataclass
class Float8BlockwiseTrainingWeight(QuantizedArray):
    """Trainable hp weight whose linears run blockwise-fp8 fwd+bwd."""

    weight: jnp.ndarray
    block_size: int = static_field(default=128)

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def dequantize(self, output_dtype=None):
        w = _qdq_blocks_2d(
            self.weight, self.block_size
        ).astype(output_dtype or self.weight.dtype)
        return w


@dataclasses.dataclass
class Float8BlockwiseTrainingConfig(AOBaseConfig):
    """Swap config (reference ``Float8BlockwiseLinearConfig`` for
    training): wrap 2-D weights whose dims divide ``block_size``."""

    block_size: int = 128
    version: int = 1


@register_quantize_module_handler(Float8BlockwiseTrainingConfig)
def _bw_training_transform(w, config: Float8BlockwiseTrainingConfig):
    b = config.block_size
    if w.ndim != 2 or w.shape[0] % b or w.shape[1] % b:
        return w
    return Float8BlockwiseTrainingWeight(weight=w, block_size=b)


def convert_to_blockwise_fp8_training(params, filter_fn=None,
                                      block_size: int = 128):
    from torchao_tpu.quantization.quant_api import quantize_

    return quantize_(
        params, Float8BlockwiseTrainingConfig(block_size), filter_fn
    )


def _register_dispatch():
    from torchao_tpu.ops.qlinear import _DISPATCH, register_qlinear_dispatch

    if any(n == "blockwise_fp8_training" for n, _, _ in _DISPATCH):
        return

    def check(x, w, b):
        return isinstance(w, Float8BlockwiseTrainingWeight)

    def impl(x, w, bias, preference):
        out = blockwise_fp8_linear(x, w.weight, w.block_size)
        return out + bias if bias is not None else out

    register_qlinear_dispatch("blockwise_fp8_training", check, impl)


_register_dispatch()
