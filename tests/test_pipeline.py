"""Pipeline parallelism (layer-axis sharding) correctness on a CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.parallel.pipeline import (
    make_pp_forward,
    pp_cache_specs,
    pp_param_specs,
)
from torchao_tpu.parallel.sharding import make_mesh
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    quantize_,
)


def _model(n_layer=4, dtype=jnp.float32):
    args = ModelArgs(
        block_size=128, vocab_size=256, n_layer=n_layer, n_head=4,
        n_local_heads=2, dim=64, intermediate_size=128,
    )
    model = Transformer(args, dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


@pytest.mark.parametrize("quantized", [False, True])
def test_pp_prefill_and_decode_matches_single_device(quantized):
    model, params = _model(n_layer=4)
    if quantized:
        params = quantize_(
            params, Int4WeightOnlyConfig(group_size=32),
            filter_fn=default_linear_filter,
        )
    mesh = make_mesh({"pipe": 4})
    sparams = jax.device_put(params, pp_param_specs(params, mesh))
    cache = model.setup_caches(2, 32)
    scache = jax.device_put(cache, pp_cache_specs(cache, mesh))

    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 8)), jnp.int32
    )
    pp = make_pp_forward(model, mesh)
    lg, scache = pp(sparams, toks, 0, scache)

    c0 = model.setup_caches(2, 32)
    ref, c0 = model(params, toks, 0, c0)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )

    # greedy decode 5 steps through the pipelined cache
    nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
    rnxt = jnp.argmax(ref[:, -1], axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(rnxt))
    pos = 8
    for _ in range(5):
        lg, scache = pp(sparams, nxt[:, None], pos, scache)
        ref, c0 = model(params, rnxt[:, None], pos, c0)
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        rnxt = jnp.argmax(ref[:, -1], axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(nxt), np.asarray(rnxt))
        pos += 1


def test_pp_with_quantized_kv_cache():
    model, params = _model(n_layer=4)
    mesh = make_mesh({"pipe": 4})
    sparams = jax.device_put(params, pp_param_specs(params, mesh))
    cache = model.setup_caches(2, 32, quantize="int8")
    scache = jax.device_put(cache, pp_cache_specs(cache, mesh))
    toks = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (2, 6)), jnp.int32
    )
    pp = make_pp_forward(model, mesh)
    lg, scache = pp(sparams, toks, 0, scache)

    c0 = model.setup_caches(2, 32, quantize="int8")
    ref, _ = model(params, toks, 0, c0)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("num_microbatches", [2, 4])
def test_pp_microbatch_matches_single_device(num_microbatches):
    """GPipe microbatch schedule: logits + cache identical to the
    unsharded model for prefill and decode (B=4 split into M mbs)."""
    from torchao_tpu.parallel.pipeline import make_pp_microbatch_forward

    model, params = _model(n_layer=4)
    mesh = make_mesh({"pipe": 4})
    sparams = jax.device_put(params, pp_param_specs(params, mesh))
    B = 4
    cache = model.setup_caches(B, 32)
    scache = jax.device_put(cache, pp_cache_specs(cache, mesh))

    toks = jnp.asarray(
        np.random.RandomState(3).randint(0, 256, (B, 8)), jnp.int32
    )
    pp = make_pp_microbatch_forward(model, mesh, num_microbatches)
    lg, scache = pp(sparams, toks, 0, scache)

    c0 = model.setup_caches(B, 32)
    ref, c0 = model(params, toks, 0, c0)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )

    # decode steps with per-slot position vector (serving shape)
    nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
    pos = jnp.full((B,), 8, jnp.int32)
    for _ in range(3):
        lg, scache = pp(sparams, nxt[:, None], pos, scache)
        ref, c0 = model(params, nxt[:, None], pos, c0)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(ref, np.float32),
            rtol=2e-4, atol=2e-4,
        )
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        pos = pos + 1
