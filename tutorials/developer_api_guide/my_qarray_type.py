"""Tutorial: add a new quantized array type.

TPU-native counterpart of the reference's
``tutorials/developer_api_guide/my_dtype_tensor_subclass.py``: where
torch needs a ``__torch_dispatch__`` tensor subclass + op table, here a
type is a frozen-dataclass **pytree** plus one dispatch registration.

Run: python tutorials/developer_api_guide/my_qarray_type.py
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
)

import jax
if __import__("os").environ.get("TUTORIAL_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from torchao_tpu import ops
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)

# ---------------------------------------------------------------------------
# 1. the type: array leaves are pytree children (jit/shard/donate work
#    for free), static metadata rides along the treedef
# ---------------------------------------------------------------------------


@qarray_dataclass
class MyInt16Array(QuantizedArray):
    """Toy example: int16 symmetric per-channel weights."""

    qdata: jnp.ndarray                 # [N, K] int16
    scale: jnp.ndarray                 # [N] f32
    orig_dtype: str = static_field(default="float32")

    @property
    def shape(self):
        return self.qdata.shape

    @property
    def dtype(self):
        return jnp.dtype(self.orig_dtype)

    @classmethod
    def from_hp(cls, w):
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(amax, 1e-12) / 32767.0
        q = jnp.round(w / scale[:, None]).astype(jnp.int16)
        return cls(qdata=q, scale=scale,
                   orig_dtype=str(jnp.dtype(w.dtype)))

    def dequantize(self, output_dtype=None):
        out = self.qdata.astype(jnp.float32) * self.scale[:, None]
        return out.astype(output_dtype or self.dtype)


# ---------------------------------------------------------------------------
# 2. the fast path: one ordered-registry entry; before it exists, the
#    dequant fallback in ops.linear already makes the type *work*
# ---------------------------------------------------------------------------


def _check(x, w, bias):
    return isinstance(w, MyInt16Array)


def _impl(x, w, bias, preference):
    out = jnp.matmul(
        x, w.qdata.T.astype(x.dtype)
    ) * w.scale.astype(x.dtype)[None, :]
    return out + bias if bias is not None else out


ops.register_qlinear_dispatch("my_int16", _check, _impl)


if __name__ == "__main__":
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(32, 64), jnp.float32)
    x = jnp.asarray(rs.randn(4, 64), jnp.float32)
    qw = MyInt16Array.from_hp(w)

    out = jax.jit(lambda x, w: ops.linear(x, w))(x, qw)  # jit: free
    ref = x @ w.T
    from torchao_tpu.utils import compute_error

    sqnr = float(compute_error(ref, out))
    print("SQNR vs hp (dB):", sqnr)   # int16 quant; on TPU the matmul
    assert sqnr > 30                  # itself runs in bf16 (~35-40 dB)
    # pytrees flatten like any params tree:
    leaves = jax.tree_util.tree_leaves(qw)
    print("pytree leaves:", [l.shape for l in leaves])
    print("OK")
