"""Speculative decoding with TRAINED draft/target (VERDICT r3 #4).

The hardware win (5.13× at k=5, scripts/spec_win_r4.py) rests on two
properties this test pins on CPU: (a) a separately-trained small draft
reaches high greedy acceptance against a trained target on the same
corpus, and (b) the round structure actually amortizes target passes
(tokens/round ≫ 1 → fewer target passes than vanilla's one-per-token).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.generate import make_prefill
from torchao_tpu.models.llama.model import ModelArgs, Transformer
from torchao_tpu.models.llama.speculative import (
    early_exit_draft,
    make_speculative_decode,
)
from torchao_tpu.testing.synthetic import markov_corpus, train_tiny_llama


@pytest.fixture(scope="module")
def trained_pair():
    toks, _ = markov_corpus(0, 128, 40000)
    targs = ModelArgs(
        block_size=256, vocab_size=128, n_layer=4, n_head=4,
        n_local_heads=4, dim=256, intermediate_size=512,
        rope_base=10000,
    )
    dargs = ModelArgs(
        block_size=256, vocab_size=128, n_layer=1, n_head=2,
        n_local_heads=2, dim=64, intermediate_size=128,
        rope_base=10000,
    )
    target = Transformer(targs, dtype=jnp.float32)
    draft = Transformer(dargs, dtype=jnp.float32)
    tp, _ = train_tiny_llama(
        target, target.init_params(jax.random.PRNGKey(0)), toks,
        steps=250, seq_len=32, batch=16,
    )
    dp, _ = train_tiny_llama(
        draft, draft.init_params(jax.random.PRNGKey(1)), toks,
        steps=250, seq_len=32, batch=16,
    )
    return target, tp, draft, dp, toks


def _run_spec(target, tp, dmodel, dp, toks, k=3, new=63):
    prompt = jnp.asarray(toks[:32][None, :].copy(), jnp.int32)
    prefill = make_prefill(target)
    dprefill = make_prefill(dmodel)
    spec = make_speculative_decode(target, dmodel, new, k)
    cache = target.setup_caches(1, 128 + k + 1)
    dcache = dmodel.setup_caches(1, 128 + k + 1)
    key = jax.random.PRNGKey(0)
    first, cache = prefill(tp, prompt, cache, key, 0.0, None)
    _, dcache = dprefill(dp, prompt, dcache, key, 0.0, None)
    rest, _, _, st = spec(
        tp, dp, prompt[:, -1], first, cache, dcache, 32, key, 0.0, None
    )
    rounds, drafted, accepted = (int(x) for x in st)
    return rounds, drafted, accepted, new


def test_trained_draft_high_acceptance_and_pass_savings(trained_pair):
    target, tp, draft, dp, toks = trained_pair
    rounds, drafted, accepted, new = _run_spec(
        target, tp, draft, dp, toks, k=3
    )
    alpha = accepted / max(drafted, 1)
    tokens_per_round = new / rounds
    print(f"\nacceptance {alpha:.3f}, tokens/round {tokens_per_round:.2f}")
    assert alpha > 0.5, alpha
    # target passes = rounds (one verify each) vs `new` for vanilla:
    # the win condition is strictly fewer target passes per token
    assert tokens_per_round > 1.5, tokens_per_round


def test_early_exit_draft_accepts(trained_pair):
    target, tp, _, _, toks = trained_pair
    emodel, eparams = early_exit_draft(target, tp, 2)
    rounds, drafted, accepted, new = _run_spec(
        target, tp, emodel, eparams, toks, k=3
    )
    alpha = accepted / max(drafted, 1)
    assert alpha > 0.3, alpha
    assert new / rounds > 1.2, (new, rounds)
