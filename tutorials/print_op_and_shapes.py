"""Print every op and its operand shapes in a quantized model forward.

JAX-native analog of the reference's
``tutorials/developer_api_guide/print_op_and_shapes.py`` (which hooks
``__torch_function__`` to log ops): in JAX the same information is in
the jaxpr — trace the function once and walk the equations. Useful for
finding which linear shapes a model actually runs (the input to
autoquant-style per-shape kernel choices).

Run: ``python tutorials/print_op_and_shapes.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from torchao_tpu import ops  # noqa: E402
from torchao_tpu.quantization.quant_api import (  # noqa: E402
    Int4WeightOnlyConfig,
    quantize_,
)

params = {
    "fc1": jnp.asarray(np.random.randn(128, 64), jnp.bfloat16),
    "fc2": jnp.asarray(np.random.randn(32, 128), jnp.bfloat16),
}
qparams = quantize_(params, Int4WeightOnlyConfig(group_size=32))


def forward(p, x):
    h = jax.nn.relu(ops.linear(x, p["fc1"]))
    return ops.linear(h, p["fc2"])


x = jnp.zeros((4, 64), jnp.bfloat16)
jaxpr = jax.make_jaxpr(forward)(qparams, x)

seen_linears = []
for eqn in jaxpr.jaxpr.eqns:
    shapes = [
        getattr(v.aval, "shape", None) for v in eqn.invars
        if hasattr(v, "aval")
    ]
    print(f"{eqn.primitive.name:24s} {shapes}")
    if eqn.primitive.name in ("dot_general", "pallas_call"):
        seen_linears.append(shapes)

print(f"\n{len(jaxpr.jaxpr.eqns)} ops; {len(seen_linears)} matmul-class "
      "ops (feed these shapes to autoquant / the kernel autotuner)")
assert seen_linears, "expected at least one matmul in the trace"
print("OK")
