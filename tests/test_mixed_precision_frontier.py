"""autoquant_v2-essence frontier search (VERDICT r2 #8).

Reference: ``prototype/quantization/autoquant_v2.py`` — graph-aware
sensitivity + batch-shape interpolation. Here: per-layer sensitivity →
greedy least-loss-per-byte downgrades → a (bytes, ppl) frontier measured
through the full synthetic-corpus eval harness, asserting a mixed
assignment DOMINATES uniform int4wo-32 (fewer streamed bytes AND lower
held-out perplexity)."""

import jax
import jax.numpy as jnp
import pytest

from torchao_tpu.models.llama.eval import evaluate_ppl
from torchao_tpu.models.llama.model import Transformer, default_linear_filter
from torchao_tpu.prototype.mixed_precision.search import (
    _leaf_paths,
    interpolate_batch_cost,
    pareto_mixed_precision,
    quantized_bytes,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
    UIntXWeightOnlyConfig,
    quantize_,
)
from torchao_tpu.testing.synthetic import markov_corpus, train_tiny_llama


def test_batch_shape_interpolation():
    measured = {1: 1.0, 8: 1.5, 128: 9.0}
    assert interpolate_batch_cost(measured, 8) == 1.5
    mid = interpolate_batch_cost(measured, 68)
    assert 1.5 < mid < 9.0
    assert abs(mid - (1.5 + 60 / 120 * 7.5)) < 1e-9
    # extrapolation beyond the largest point scales with rows
    assert interpolate_batch_cost(measured, 256) == pytest.approx(18.0)


@pytest.mark.slow
def test_frontier_dominates_uniform_int4():
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    toks, _theo = markov_corpus(0, 512, 65536)
    params = model.init_params(jax.random.PRNGKey(0))
    params, _ = train_tiny_llama(model, params, toks[:49152], steps=600)
    held = toks[49152:]

    def ppl(p):
        return evaluate_ppl(model, p, held, seq_len=64, max_windows=64)

    cands = [
        UIntXWeightOnlyConfig(dtype="uint3", group_size=32),
        Int4WeightOnlyConfig(group_size=32),
        Int8WeightOnlyConfig(),
    ]
    q4 = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    ppl4 = ppl(q4)
    paths = _leaf_paths(params, default_linear_filter)
    bytes4 = sum(
        quantized_bytes(params, p, Int4WeightOnlyConfig(group_size=32))
        for p in paths
    )

    frontier = pareto_mixed_precision(
        params, lambda p: -ppl(p), cands,
        filter_fn=default_linear_filter, num_points=5,
    )
    assert len(frontier) >= 3
    # bytes decrease monotonically along the frontier
    bs = [pt["bytes"] for pt in frontier]
    assert bs == sorted(bs, reverse=True)
    # measured 2026-08-21: {bytes 301056, ppl 5.846} vs uniform int4
    # {315392, 5.900} — int8 attention + uint3 w13 + int4 w2/output
    dominating = [
        pt for pt in frontier
        if pt["bytes"] <= bytes4 and -pt["quality"] < ppl4
    ]
    assert dominating, (
        [(pt["bytes"], -pt["quality"]) for pt in frontier],
        (bytes4, ppl4),
    )
