"""Long-context behavior: linear (not quadratic) mask cost, int8-KV
memory halving — the role of the reference's 131k-token KV-quant +
linear_causal_mask benchmarks (BASELINE.md KV section)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    init_kv_cache,
)
from torchao_tpu.utils import get_model_size_in_bytes


def kv_cache_bytes(args, batch, seq, quantized):
    cache = jax.eval_shape(
        lambda: init_kv_cache(args, batch, seq, jnp.bfloat16, quantized)
    )
    return sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(cache)
    )


def test_int8_kv_halves_cache_memory():
    args = ModelArgs.from_name("Llama-3-8B")
    bf16 = kv_cache_bytes(args, 1, 131072, False)
    int8 = kv_cache_bytes(args, 1, 131072, True)
    # reference KV table: 131k bf16 cache ≈ 2×int8 payload (+ scales)
    assert bf16 / int8 > 1.9, (bf16, int8)
    # absolute sanity vs the reference's published cache scale: bf16 KV at
    # 131k for an 8B (8 kv heads × 128 dim × 32 layers) ≈ 17 GB
    assert 15e9 < bf16 < 20e9


def test_decode_at_long_context_is_linear_in_s():
    """Decoding one token must not materialize an S×S mask — memory of
    the decode step grows linearly with S (abstract eval)."""
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params_shape = jax.eval_shape(
        lambda: model.init_params(jax.random.PRNGKey(0))
    )

    def step_cost(S):
        cache = jax.eval_shape(
            lambda: model.setup_caches(1, S)
        )
        tok = jax.ShapeDtypeStruct((1, 1), jnp.int32)

        def f(p, t, c):
            logits, c2 = model(p, t, S - 2, c)
            return logits

        jaxpr = jax.make_jaxpr(f)(params_shape, tok, cache)
        # sum sizes of all intermediate values in the jaxpr
        total = 0
        for eqn in jaxpr.jaxpr.eqns:
            for var in eqn.outvars:
                aval = var.aval
                if hasattr(aval, "shape"):
                    total += int(np.prod(aval.shape) or 1)
        return total

    c1, c2 = step_cost(2048), step_cost(8192)
    # linear scaling: 4x S → ≤ ~5x intermediates; quadratic would be ~16x
    assert c2 / c1 < 6, (c1, c2)


def test_decode_correct_at_16k(monkeypatch):
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    model.args.block_size = 16384
    model.freqs = __import__(
        "torchao_tpu.models.llama.model", fromlist=["precompute_freqs_cis"]
    ).precompute_freqs_cis(model.args)
    params = model.init_params(jax.random.PRNGKey(0))
    cache = model.setup_caches(1, 16384, quantize=True)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (1, 4)), jnp.int32
    )
    # prefill at 0, then decode at a deep position
    l0, cache = model(params, toks, 0, cache)
    l1, cache = model(
        params, toks[:, :1], 16000, cache
    )
    assert bool(jnp.all(jnp.isfinite(l1)))
