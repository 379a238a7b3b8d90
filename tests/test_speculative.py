"""Speculative decoding correctness.

Key property tests:
- GREEDY EXACTNESS: temperature-0 speculative output is bit-identical to
  temperature-0 vanilla decode, for ANY draft model (the rejection rule
  degenerates to `accept iff draft token == target argmax`).
- FULL ACCEPTANCE: with draft == target every draft token is accepted
  (acceptance ratio min(1, p/p) = 1).
- stochastic path runs and emits the right shapes with quantized KV.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchao_tpu.models.llama.generate import generate
from torchao_tpu.models.llama.model import ModelArgs, Transformer
from torchao_tpu.models.llama.speculative import generate_speculative


def _tiny(n_layer=3, seed=0, **kw):
    args = ModelArgs(
        block_size=256, vocab_size=199, n_layer=n_layer, n_head=4,
        n_local_heads=2, dim=64, intermediate_size=128, **kw,
    )
    model = Transformer(args, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


@pytest.mark.parametrize("spec_k", [1, 3, 5])
def test_greedy_exactness_any_draft(spec_k):
    model, params = _tiny(n_layer=3, seed=0)
    draft, dparams = _tiny(n_layer=1, seed=7)  # unrelated draft weights
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, 199, (1, 12)), jnp.int32
    )
    ref = generate(
        model, params, prompt, 24, temperature=0.0, top_k=None,
        key=jax.random.PRNGKey(3),
    )
    out, stats = generate_speculative(
        model, params, draft, dparams, prompt, 24,
        spec_k=spec_k, temperature=0.0, top_k=None,
        key=jax.random.PRNGKey(99), return_stats=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats["rounds"] >= 1


def test_greedy_exactness_batch2():
    model, params = _tiny(n_layer=2, seed=1)
    draft, dparams = _tiny(n_layer=1, seed=2)
    prompt = jnp.asarray(
        np.random.RandomState(1).randint(0, 199, (2, 9)), jnp.int32
    )
    ref = generate(
        model, params, prompt, 17, temperature=0.0, top_k=None,
    )
    out = generate_speculative(
        model, params, draft, dparams, prompt, 17,
        spec_k=3, temperature=0.0, top_k=None,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_full_acceptance_when_draft_is_target():
    model, params = _tiny(n_layer=2, seed=0)
    prompt = jnp.asarray(
        np.random.RandomState(2).randint(0, 199, (1, 8)), jnp.int32
    )
    out, stats = generate_speculative(
        model, params, model, params, prompt, 20,
        spec_k=4, temperature=0.8, top_k=50,
        key=jax.random.PRNGKey(5), return_stats=True,
    )
    assert out.shape == (1, 28)
    # identical draft/target: acceptance prob is exactly 1 every position
    assert stats["accepted"] == stats["drafted"]
    # all-accept means every round advances k+1 tokens
    assert stats["rounds"] == -(-19 // 5)


def test_stochastic_with_quantized_kv():
    model, params = _tiny(n_layer=2, seed=0)
    draft, dparams = _tiny(n_layer=1, seed=3)
    prompt = jnp.asarray(
        np.random.RandomState(3).randint(0, 199, (1, 10)), jnp.int32
    )
    out, stats = generate_speculative(
        model, params, draft, dparams, prompt, 16,
        spec_k=3, temperature=0.9, top_k=40,
        kv_cache_quantization=True,
        key=jax.random.PRNGKey(11), return_stats=True,
    )
    assert out.shape == (1, 26)
    v = np.asarray(out)
    assert ((v >= 0) & (v < 199)).all()
    assert 0 <= stats["accepted"] <= stats["drafted"]


def test_greedy_exactness_quantized_kv():
    """Greedy exactness must hold through the quantized-KV path too:
    both vanilla and speculative use the same int8 cache quantization,
    so their logits (and argmaxes) see identical cache values."""
    model, params = _tiny(n_layer=2, seed=4)
    draft, dparams = _tiny(n_layer=1, seed=5)
    prompt = jnp.asarray(
        np.random.RandomState(4).randint(0, 199, (1, 11)), jnp.int32
    )
    ref = generate(
        model, params, prompt, 15, temperature=0.0, top_k=None,
        kv_cache_quantization=True,
    )
    out = generate_speculative(
        model, params, draft, dparams, prompt, 15,
        spec_k=4, temperature=0.0, top_k=None,
        kv_cache_quantization=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_early_exit_draft_quantized():
    """Early-exit self-draft: sliced stacked quantized weights + shared
    embeddings/head; greedy spec output must still equal vanilla greedy
    (exactness holds for any draft — this exercises the QuantizedArray
    layer truncation incl. logical_shape metadata)."""
    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.models.llama.speculative import early_exit_draft
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    model, params = _tiny(n_layer=4, seed=0)
    qparams = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    draft, dparams = early_exit_draft(model, qparams, 2)
    assert draft.args.n_layer == 2
    w = dparams["layers"]["feed_forward"]["w13"]
    assert w.qdata.shape[0] == 2 and w.logical_shape[0] == 2

    prompt = jnp.asarray(
        np.random.RandomState(7).randint(0, 199, (1, 10)), jnp.int32
    )
    ref = generate(
        model, qparams, prompt, 14, temperature=0.0, top_k=None
    )
    out = generate_speculative(
        model, qparams, draft, dparams, prompt, 14,
        spec_k=3, temperature=0.0, top_k=None,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cli_speculate_smoke():
    from torchao_tpu.models.llama import cli

    res = cli.main([
        "--model_name", "tiny-debug", "-q", "int4wo-32",
        "--speculate", "1", "--spec_k", "2",
        "--prompt_len", "8", "--max_new_tokens", "6",
        "--write_result", "",
    ])
    assert res["tokens_per_s"] > 0
    assert 0.0 <= res["acceptance_rate"] <= 1.0
