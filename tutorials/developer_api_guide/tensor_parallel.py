"""Tutorial: tensor-parallel quantized weights.

Counterpart of the reference's ``tensor_parallel.py`` (DTensor sharding
of a quantized subclass): because quantized arrays here are pytrees,
``jax.sharding.NamedSharding`` applies leaf-by-leaf — the helper in
``parallel/sharding.py`` derives each leaf's PartitionSpec from the
logical weight spec (qdata shards like the weight, scales follow their
reduction axes).

Run (works on CPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tutorials/developer_api_guide/tensor_parallel.py
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from torchao_tpu import ops  # noqa: E402
from torchao_tpu.parallel.sharding import param_shardings  # noqa: E402
from torchao_tpu.quantization.quant_api import (  # noqa: E402
    Int8WeightOnlyConfig,
    quantize_,
)

if __name__ == "__main__":
    n = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n), ("data", "model"))

    rs = np.random.RandomState(0)
    params = {"w1": jnp.asarray(rs.randn(256, 128), jnp.float32)}
    qparams = quantize_(params, Int8WeightOnlyConfig(),
                        filter_fn=lambda p, l: True)

    # column-parallel: shard output features over the model axis
    specs = param_shardings(qparams, {"w1": P("model", None)}, mesh)
    sharded = jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh), qparams, specs,
        is_leaf=lambda l: hasattr(l, "ndim"),
    )

    x = jnp.asarray(rs.randn(4, 128), jnp.float32)

    @jax.jit
    def f(x, p):
        return ops.linear(x, p["w1"])

    out = f(x, sharded)
    ref = x @ params["w1"].T
    from torchao_tpu.utils import compute_error

    sqnr = float(compute_error(ref, out))
    print("devices:", n, "qdata sharding:",
          sharded["w1"].qdata.sharding.spec)
    print("SQNR vs unsharded hp (dB):", sqnr)
    assert sqnr > 25
    print("OK")
