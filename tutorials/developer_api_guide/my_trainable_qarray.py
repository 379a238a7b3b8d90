"""Tutorial: a *trainable* quantized array type.

Counterpart of the reference's ``my_trainable_tensor_subclass.py``: the
wrapper keeps the high-precision weight as its only trainable leaf and
fake-quantizes on use with a straight-through gradient — ``jax.grad``
over the params pytree trains it with no optimizer special-casing.

Run: python tutorials/developer_api_guide/my_trainable_qarray.py
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
import optax

from torchao_tpu import ops
from torchao_tpu.qtypes.base import QuantizedArray, qarray_dataclass
from torchao_tpu.quantization.quant_primitives import round_ste


@qarray_dataclass
class MyTrainableInt8(QuantizedArray):
    weight: jnp.ndarray   # hp, TRAINABLE

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def fake_quantized(self):
        amax = jnp.max(jnp.abs(self.weight), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(round_ste(self.weight / scale), -128, 127)
        return q * scale                 # STE: grad flows through round

    def dequantize(self, output_dtype=None):
        w = self.fake_quantized()
        return w if output_dtype is None else w.astype(output_dtype)


ops.register_qlinear_dispatch(
    "my_trainable_int8",
    lambda x, w, b: isinstance(w, MyTrainableInt8),
    lambda x, w, b, pref: jnp.matmul(x, w.fake_quantized().T)
    + (b if b is not None else 0),
)


if __name__ == "__main__":
    rs = np.random.RandomState(0)
    params = {"lin": MyTrainableInt8(
        weight=jnp.asarray(rs.randn(16, 32) * 0.3, jnp.float32)
    )}
    x = jnp.asarray(rs.randn(64, 32), jnp.float32)
    y = jnp.asarray(rs.randn(64, 16), jnp.float32)

    def loss(p):
        return jnp.mean((ops.linear(x, p["lin"]) - y) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(200):
        g = jax.grad(loss)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    l1 = float(loss(params))
    print(f"loss {l0:.4f} -> {l1:.4f}")
    assert l1 < l0 * 0.7
    print("OK")
