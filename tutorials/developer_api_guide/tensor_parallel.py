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

    # -----------------------------------------------------------------
    # Part 2 (round 4): the PRODUCTION multi-chip path — shard_map TP.
    # GSPMD cannot partition Mosaic (Pallas) custom calls, so on real
    # multi-chip TPU the decode wraps the unmodified single-chip model
    # in shard_map; the model inserts the Megatron collectives itself.
    # -----------------------------------------------------------------
    from torchao_tpu.models.llama.model import (
        ModelArgs, Transformer, default_linear_filter,
    )
    from torchao_tpu.parallel import make_mesh, shard_params
    from torchao_tpu.parallel.sharding import kv_cache_specs
    from torchao_tpu.parallel.tp import (
        make_tp_decode_step, prepare_tp_params_shardmap,
    )
    from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

    args = ModelArgs(
        block_size=64, vocab_size=512, n_layer=2, n_head=16,
        n_local_heads=8, dim=512, intermediate_size=1024,
        rope_base=10000,
        # fused projections split per-device block under TP:
        qkv_device_blocks=n, ffn_device_blocks=n,
    )
    model = Transformer(args, dtype=jnp.float32)
    q = quantize_(
        model.init_params(jax.random.PRNGKey(0)),
        Int4WeightOnlyConfig(group_size=32), default_linear_filter,
    )
    # interleave wqkv/w13 device-major + re-pack row-parallel nibbles
    tp_params = prepare_tp_params_shardmap(q, args, n)
    tmesh = make_mesh({"data": 1, "model": n})
    sparams = shard_params(tp_params, tmesh)
    cache = model.setup_caches(2, 32, quantize="int8_smajor")
    scache = jax.device_put(cache, kv_cache_specs(cache, tmesh))

    step = jax.jit(make_tp_decode_step(model, tmesh))
    logits, scache = step(
        sparams, jnp.zeros((2, 1), jnp.int32), 3, scache
    )
    ref_model = Transformer(
        ModelArgs(**{**args.__dict__, "qkv_device_blocks": 1,
                     "ffn_device_blocks": 1}), dtype=jnp.float32,
    )
    ref_logits, _ = ref_model(
        q, jnp.zeros((2, 1), jnp.int32), 3,
        ref_model.setup_caches(2, 32, quantize="int8_smajor"),
    )
    err = float(jnp.max(jnp.abs(logits - ref_logits)))
    print("shard_map TP decode max |Δlogits| vs single-device:", err)
    assert err < 1e-3
    print("TP OK")
