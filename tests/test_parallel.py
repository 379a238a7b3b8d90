"""Sharding tests on the 8-device CPU mesh: quantized Llama params sharded
dp×tp, forward + decode agree with the unsharded single-device result
(mirrors ``test/dtypes/test_affine_quantized_tensor_parallel.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import Transformer, default_linear_filter
from torchao_tpu.parallel import (
    kv_cache_specs,
    llama_param_specs,
    make_mesh,
    shard_params,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
    quantize_,
)


# a TP-friendly tiny config (heads divisible by model axis)
from torchao_tpu.models.llama.model import transformer_configs

transformer_configs.setdefault(
    "tiny-tp",
    dict(
        block_size=128, vocab_size=512, n_layer=2, n_head=8,
        n_local_heads=4, dim=256, intermediate_size=512, rope_base=10000,
    ),
)


@pytest.fixture(scope="module")
def setup():
    model = Transformer.from_name("tiny-tp", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 2, "model": 4})
    return model, params, mesh


@pytest.mark.parametrize(
    "config", [None, Int8WeightOnlyConfig(), Int4WeightOnlyConfig(group_size=32)]
)
def test_tp_forward_matches_unsharded(setup, config):
    model, params, mesh = setup
    if config is not None:
        params = quantize_(params, config, filter_fn=default_linear_filter)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (2, 8)), jnp.int32
    )
    ref, _ = model(params, toks)

    sparams = shard_params(params, mesh)
    out, _ = jax.jit(lambda p, t: model(p, t))(sparams, toks)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_tp_decode_with_sharded_cache(setup):
    model, params, mesh = setup
    qparams = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    sparams = shard_params(qparams, mesh)
    cache = model.setup_caches(2, 16)
    scache = jax.device_put(cache, kv_cache_specs(cache, mesh))
    toks = jnp.asarray(
        np.random.RandomState(1).randint(0, 512, (2, 8)), jnp.int32
    )

    @jax.jit
    def prefill_and_decode(p, t, c):
        logits, c = model(p, t, 0, c)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        logits2, c = model(p, nxt[:, None], 8, c)
        return logits, logits2

    l1, l2 = prefill_and_decode(sparams, toks, scache)

    # unsharded reference
    c0 = model.setup_caches(2, 16)
    r1, c0 = model(qparams, toks, 0, c0)
    nxt = jnp.argmax(r1[:, -1], axis=-1).astype(jnp.int32)
    r2, _ = model(qparams, nxt[:, None], 8, c0)
    np.testing.assert_allclose(
        np.asarray(l2, np.float32), np.asarray(r2, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_specs_cover_all_leaves(setup):
    model, params, mesh = setup
    qparams = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    specs = llama_param_specs(qparams, mesh)
    # structure matches exactly (device_put would fail otherwise)
    jax.tree_util.tree_map(lambda a, b: None, qparams, specs)
    # column-parallel wqkv: K-major tiled qdata [L, K/2, N] → out features
    # (model-sharded) are on the LAST axis
    s = specs["layers"]["attention"]["wqkv"].qdata.spec
    assert s == jax.sharding.PartitionSpec(None, None, "model")


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_tp_decode_with_sharded_quantized_cache(setup, kv):
    """TP decode through QUANTIZED sharded caches — the smajor split-flat
    int8 layout (k_q [L,B,Hkv*Dh,S] / v_q [L,B,S,Hkv*Dh], the serving
    default) and the packed int4 cache; logits must match the unsharded
    run (same quantization math on both sides)."""
    model, params, mesh = setup
    qparams = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    sparams = shard_params(qparams, mesh)
    cache = model.setup_caches(2, 16, quantize=kv)
    scache = jax.device_put(cache, kv_cache_specs(cache, mesh))
    toks = jnp.asarray(
        np.random.RandomState(2).randint(0, 512, (2, 8)), jnp.int32
    )

    @jax.jit
    def prefill_and_decode(p, t, c):
        logits, c = model(p, t, 0, c)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        logits2, c = model(p, nxt[:, None], 8, c)
        return logits, logits2

    _, l2 = prefill_and_decode(sparams, toks, scache)

    c0 = model.setup_caches(2, 16, quantize=kv)
    r1, c0 = model(qparams, toks, 0, c0)
    nxt = jnp.argmax(r1[:, -1], axis=-1).astype(jnp.int32)
    r2, _ = model(qparams, nxt[:, None], 8, c0)
    np.testing.assert_allclose(
        np.asarray(l2, np.float32), np.asarray(r2, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_interleaved_qkv_logit_parity(setup):
    """Device-major wqkv interleave (aligned TP) + per-block split is
    numerically identical to the naive section split, quantized and
    float."""
    from torchao_tpu.models.llama.model import ModelArgs, Transformer
    from torchao_tpu.parallel import interleave_qkv_params

    model, params, mesh = setup
    m = 4
    toks = jnp.asarray(
        np.random.RandomState(1).randint(0, 512, (2, 8)), jnp.int32
    )

    margs = ModelArgs(**transformer_configs["tiny-tp"])
    margs.qkv_device_blocks = m
    bmodel = Transformer(margs, dtype=jnp.float32)

    for config in (None, Int4WeightOnlyConfig(group_size=32)):
        p = (
            params if config is None
            else quantize_(params, config, filter_fn=default_linear_filter)
        )
        ref, _ = model(p, toks)  # naive split, same (quantized) weights
        ip = interleave_qkv_params(p, margs, m)
        out, _ = bmodel(ip, toks)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=1e-4, atol=1e-4,
        )
        # sharded run too
        sp = shard_params(ip, mesh)
        sout, _ = jax.jit(lambda p, t: bmodel(p, t))(sp, toks)
        np.testing.assert_allclose(
            np.asarray(sout, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2,
        )


def test_tp_decode_evidence_structure():
    """The quantitative TP evidence harness (VERDICT r2 #7): timings
    present, no weight all-to-alls, canonical reduction count."""
    from torchao_tpu.parallel.evidence import tp_decode_evidence

    res = tp_decode_evidence(4, steps=2, dim=256)
    assert res["tp_timing"]["scaled_tp_step_ms"] > 0
    assert res["hlo"]["reduction_collectives"] >= 1
    assert "all-to-all" not in res["hlo"]["stats"]
