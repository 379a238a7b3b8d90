"""Shape-level validation of the BASELINE config-5 topology: Llama-3.1-70B
int4 weights TP-sharded over an 8-device mesh — abstract eval (no
materialization) proves the sharding rules divide every quantized leaf and
the decode step type-checks end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.parallel import llama_param_specs, make_mesh
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig, quantize_


def test_70b_int4_tp8_decode_evals():
    args = ModelArgs.from_name("Llama-3.1-70B")
    args.block_size = 2048
    model = Transformer(args, dtype=jnp.bfloat16)
    mesh = make_mesh({"data": 1, "model": 8})

    # abstract params: build shapes without allocating 70B of memory
    shapes = jax.eval_shape(lambda k: model.init_params(k), jax.random.PRNGKey(0))
    qshapes = jax.eval_shape(
        lambda: quantize_(
            jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            ),
            Int4WeightOnlyConfig(group_size=64),
            filter_fn=default_linear_filter,
        )
    )

    # every quantized leaf must be divisible by its sharding spec
    specs = llama_param_specs(qshapes, mesh)

    def check(leaf, sharding):
        spec = sharding.spec
        for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
            if axis is not None:
                assert dim % mesh.shape[axis] == 0, (leaf.shape, spec)

    jax.tree_util.tree_map(check, qshapes, specs)

    # decode step type-checks under the mesh shardings
    cache_shapes = jax.eval_shape(
        lambda: model.setup_caches(1, 256)
    )

    def decode(params, tok, cache):
        logits, cache = model(params, tok, 5, cache)
        return logits

    out = jax.eval_shape(
        decode, qshapes, jnp.zeros((1, 1), jnp.int32), cache_shapes
    )
    assert out.shape == (1, 1, args.vocab_size)
