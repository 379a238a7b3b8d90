"""lm-eval adapter.

Equivalent of the reference's ``TransformerEvalWrapper``
(``torchao/_models/_eval.py:29``): exposes the JAX Llama as an
``lm_eval.api.model.LM`` so the standard wikitext/hellaswag tasks run
against quantized models. lm-eval (and network-fetched datasets) are
unavailable in this build environment, so the adapter import is lazy and
the loglikelihood core is also usable directly (``score_loglikelihoods``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def score_loglikelihoods(
    model,
    params,
    contexts: List[np.ndarray],
    continuations: List[np.ndarray],
) -> List[Tuple[float, bool]]:
    """For each (context, continuation) token pair: (sum log p of the
    continuation, whether it is the greedy decode)."""
    out = []
    for ctx, cont in zip(contexts, continuations):
        toks = jnp.asarray(
            np.concatenate([ctx, cont])[None, :], jnp.int32
        )
        logits, _ = model(params, toks)
        logp = jax.nn.log_softmax(
            logits[0].astype(jnp.float32), axis=-1
        )
        start = len(ctx) - 1
        span = logp[start : start + len(cont)]
        tgt = jnp.asarray(cont, jnp.int32)
        ll = float(
            jnp.sum(jnp.take_along_axis(span, tgt[:, None], axis=1))
        )
        greedy = bool(jnp.all(jnp.argmax(span, axis=-1) == tgt))
        out.append((ll, greedy))
    return out


def make_lm_eval_wrapper(model, params, tokenizer, max_length=2048):
    """Build an lm_eval LM (requires the lm_eval package)."""
    from lm_eval.api.model import LM  # type: ignore

    class TransformerEvalWrapper(LM):
        def loglikelihood(self, requests):
            ctxs, conts = [], []
            for req in requests:
                c, x = req.args
                ctxs.append(np.asarray(tokenizer.encode(c), np.int32))
                conts.append(np.asarray(tokenizer.encode(x), np.int32))
            return score_loglikelihoods(model, params, ctxs, conts)

        def loglikelihood_rolling(self, requests):
            from torchao_tpu.models.llama.eval import evaluate_ppl

            outs = []
            for req in requests:
                (text,) = req.args
                toks = np.asarray(tokenizer.encode(text), np.int32)
                ppl = evaluate_ppl(
                    model, params, toks, seq_len=min(max_length, len(toks) - 1)
                )
                outs.append(-float(np.log(ppl)) * max(len(toks) - 1, 1))
            return outs

        def generate_until(self, requests):
            from torchao_tpu.models.llama.generate import generate

            outs = []
            for req in requests:
                ctx, kwargs = req.args
                toks = jnp.asarray(
                    np.asarray(tokenizer.encode(ctx), np.int32)[None]
                )
                out = generate(
                    model, params, toks,
                    kwargs.get("max_gen_toks", 128), temperature=0.0,
                    top_k=None,
                )
                outs.append(
                    tokenizer.decode(np.asarray(out[0, toks.shape[1]:]))
                )
            return outs

    return TransformerEvalWrapper()
