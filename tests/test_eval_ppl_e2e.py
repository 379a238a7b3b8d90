"""End-to-end perplexity through the full eval harness (VERDICT #3).

Trains a tiny Llama on a low-entropy synthetic Markov corpus (so ppl is
meaningful, not the ~uniform ppl of random weights), then runs the SAME
path a real-weight wikitext eval would take — ``quantize_`` →
``evaluate_ppl`` — and asserts the reference's qualitative accuracy
ordering (``torchao/quantization/README.md:16-22``):

    ppl(bf16) < ppl(int4-GPTQ) < ppl(int4-RTN),  deltas small.

``scripts/synthetic_ppl_eval.py`` runs the same flow at larger scale and
prints the table; a real checkpoint + corpus drop is turn-key through
``models/llama/eval.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.eval import evaluate_ppl
from torchao_tpu.models.llama.model import (
    Transformer,
    default_linear_filter,
)
from torchao_tpu.quantization.gptq_llama import gptq_quantize_llama
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.testing.synthetic import markov_corpus, train_tiny_llama


@pytest.fixture(scope="module")
def trained():
    import optax

    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    # 64k tokens + cosine-decayed 400 steps: trains to ppl ~3.8 vs the
    # chain's theoretical 3.46, so quantization deltas are real signal.
    # (A 16k corpus overfits past ~300 steps and leaves the model at
    # ppl ~9.5, where the GPTQ-vs-RTN ordering is seed noise — measured
    # both orderings across retrains, PERF.md round-2 notes.)
    toks, theo_ppl = markov_corpus(0, 256, 64000)
    train = toks[:60000]
    params, _ = train_tiny_llama(
        model, params, train, steps=400, seq_len=64, batch=16,
        lr=optax.cosine_decay_schedule(3e-3, 400),
    )
    return model, params, train, toks[60000:], theo_ppl


def test_ppl_ordering_bf16_gptq_rtn(trained):
    model, params, train, test, theo_ppl = trained
    ppl_bf16 = evaluate_ppl(model, params, test, seq_len=64)
    # the model actually learned the chain (far below uniform ~256)
    assert ppl_bf16 < theo_ppl * 5, (ppl_bf16, theo_ppl)

    rtn = quantize_(
        params, Int4WeightOnlyConfig(group_size=32), default_linear_filter
    )
    ppl_rtn = evaluate_ppl(model, rtn, test, seq_len=64)

    # calibrate on TRAIN windows (no eval leakage)
    calib = np.stack([train[i * 64 : (i + 1) * 64] for i in range(32)])
    gptq = gptq_quantize_llama(
        model, params, jnp.asarray(calib), group_size=32
    )
    ppl_gptq = evaluate_ppl(model, gptq, test, seq_len=64)

    # int4 degrades; GPTQ recovers a real fraction of the delta (it may
    # even land below bf16 on an under-trained model — calibration acts
    # as a mild regularizer — so only the upper bound is asserted)
    assert ppl_bf16 < ppl_rtn
    assert ppl_gptq < ppl_rtn, (ppl_bf16, ppl_gptq, ppl_rtn)
    d_rtn, d_gptq = ppl_rtn - ppl_bf16, ppl_gptq - ppl_bf16
    assert d_gptq < 0.75 * d_rtn, (d_gptq, d_rtn)
    # deltas stay small in absolute terms (the BASELINE gate shape)
    assert d_rtn < 0.25 * ppl_bf16


def test_ppl_int8wo_near_lossless(trained):
    """int8wo must be near-lossless (reference Δ +0.006 on wikitext)."""
    model, params, _, test, _ = trained
    ppl_bf16 = evaluate_ppl(model, params, test, seq_len=64)
    q = quantize_(params, Int8WeightOnlyConfig(), default_linear_filter)
    ppl_int8 = evaluate_ppl(model, q, test, seq_len=64)
    assert abs(ppl_int8 - ppl_bf16) < 0.02 * ppl_bf16, (
        ppl_bf16, ppl_int8,
    )
