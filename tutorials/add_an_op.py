"""Add a new op implementation for a quantized array type.

JAX-native analog of the reference's ``tutorials/add_an_op.py`` (which
registers ``aten.t`` handling on a tensor subclass via ``implements``):
here, ops are *explicit registries* — this tutorial registers a custom
qlinear dispatch entry that intercepts int8 weight-only linears and
counts invocations, then shows the same for a whole-new op
(``quantized_outer``) built from the public pieces.

Run: ``python tutorials/add_an_op.py`` (CPU fine).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from torchao_tpu import ops  # noqa: E402
from torchao_tpu.ops.qlinear import (  # noqa: E402
    register_qlinear_dispatch,
)
from torchao_tpu.qtypes.intx import IntxArray  # noqa: E402
from torchao_tpu.quantization.quant_api import (  # noqa: E402
    Int8WeightOnlyConfig,
    quantize_,
)

# ---------------------------------------------------------------- 1.
# Intercept an existing op: a dispatch entry is (name, check, impl);
# entries are scanned in registration order, so appending runs AFTER
# the built-ins — to intercept, we insert at the front.
CALLS = {"n": 0}


def _check_counting(x, w, bias):
    return isinstance(w, IntxArray) and w.target_dtype == "int8"


def _impl_counting(x, w, bias, preference):
    CALLS["n"] += 1
    # delegate to the dequant fallback — a real impl would call a
    # Pallas kernel here (see kernels/int8_matmul.py for the pattern)
    wd = w.dequantize(x.dtype)
    out = jnp.matmul(x, wd.T)
    return out + bias if bias is not None else out


from torchao_tpu.ops import qlinear as _qlinear  # noqa: E402

_qlinear._DISPATCH.insert(0, ("count_int8", _check_counting, _impl_counting))

params = {"w": jnp.asarray(np.random.randn(64, 64), jnp.float32)}
qparams = quantize_(params, Int8WeightOnlyConfig())
x = jnp.asarray(np.random.randn(2, 64), jnp.float32)
y = ops.linear(x, qparams["w"])
assert CALLS["n"] == 1, CALLS
print("custom dispatch intercepted the int8 linear:", y.shape)

# remove the toy entry so later code uses the fast built-ins again
_qlinear._DISPATCH.pop(0)

# ---------------------------------------------------------------- 2.
# A brand-new op from public pieces: quantized outer product
def quantized_outer(a: jnp.ndarray, w: IntxArray) -> jnp.ndarray:
    """outer(a, dequant(w)[0]) — toy op showing qtype field access."""
    row = w.dequantize(a.dtype)[0]
    return jnp.outer(a, row)


o = quantized_outer(x[0], qparams["w"])
print("quantized_outer:", o.shape)
print("OK")
sys.exit(0)
