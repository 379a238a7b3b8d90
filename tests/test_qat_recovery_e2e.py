"""End-to-end QAT recovery measurement (VERDICT r3 #5).

The reference's QAT headline is *recovery of quantized ppl degradation*
(``torchao/quantization/qat/README.md:238-254``: Llama3-8B 8da4w PTQ
Δppl +2.973 → QAT Δ +0.947, i.e. ~68% recovered). That exact experiment
needs real weights/corpora (zero egress here), so this test runs the
same protocol on the synthetic-trained tiny Llama that already anchors
the ppl-ordering suite (``test_eval_ppl_e2e.py``):

  1. train a tiny Llama on a Markov corpus (float),
  2. arm A: fine-tune FLOAT for N more steps  → PTQ int4wo  → Δ_ptq
  3. arm B: QAT-prepare, fine-tune the SAME N steps through the
     fake-quant STE forward, convert                    → Δ_qat
  4. assert Δ_qat < Δ_ptq (QAT recovers a real fraction).

Both arms get identical extra optimization steps, so the measured gap is
QAT's, not extra training's.
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
from torchao_tpu.quantization.qat import (
    QATConfig,
    QATFakeQuantizedArray,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.testing.synthetic import markov_corpus, train_tiny_llama

GROUP_SIZE = 32
FT_STEPS = 150


@pytest.fixture(scope="module")
def trained():
    import optax

    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    toks, _ = markov_corpus(0, 256, 64000)
    train = toks[:60000]
    params, _ = train_tiny_llama(
        model, params, train, steps=400, seq_len=64, batch=16,
        lr=optax.cosine_decay_schedule(3e-3, 400),
    )
    return model, params, train, toks[60000:]


def test_qat_recovers_ptq_degradation(trained):
    import optax

    model, params, train, test = trained
    base = Int4WeightOnlyConfig(group_size=GROUP_SIZE)
    ft_lr = optax.cosine_decay_schedule(5e-4, FT_STEPS)

    ppl_float = evaluate_ppl(model, params, test, seq_len=64)

    # arm A: equally-long float fine-tune, then PTQ
    fparams, _ = train_tiny_llama(
        model, params, train, steps=FT_STEPS, seq_len=64, batch=16,
        lr=ft_lr, seed=7,
    )
    ptq = quantize_(fparams, base, default_linear_filter)
    ppl_ptq = evaluate_ppl(model, ptq, test, seq_len=64)
    ppl_float_ft = evaluate_ppl(model, fparams, test, seq_len=64)

    # arm B: QAT prepare → fine-tune through fake-quant STE → convert
    prepared = quantize_(
        params, QATConfig(base_config=base, step="prepare"),
        default_linear_filter,
    )
    qat_params, _ = train_tiny_llama(
        model, prepared, train, steps=FT_STEPS, seq_len=64, batch=16,
        lr=ft_lr, seed=7,
    )
    converted = quantize_(
        qat_params, QATConfig(base_config=base, step="convert"),
        lambda p, leaf: isinstance(leaf, QATFakeQuantizedArray),
    )
    ppl_qat = evaluate_ppl(model, converted, test, seq_len=64)

    d_ptq = ppl_ptq - ppl_float_ft
    d_qat = ppl_qat - ppl_float_ft
    print(
        f"\nQAT recovery: float {ppl_float:.4f} / float+ft "
        f"{ppl_float_ft:.4f}, PTQ Δ {d_ptq:+.4f}, QAT Δ {d_qat:+.4f} "
        f"(recovered {100 * (1 - d_qat / d_ptq):.0f}%)"
    )
    # PTQ must actually degrade for recovery to be meaningful
    assert d_ptq > 0.01, (ppl_ptq, ppl_float_ft)
    # the reference recovers ~68% (8da4w) / ~12% (int4wo tinygemm);
    # assert a real fraction without overfitting the synthetic setup
    assert d_qat < 0.7 * d_ptq, (d_qat, d_ptq)
