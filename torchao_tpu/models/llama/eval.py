"""Perplexity evaluation harness.

Equivalent of the reference's ``torchao/_models/llama/eval.py`` +
``TransformerEvalWrapper`` (``_models/_eval.py:29``): sliding-window ppl
over a token stream. The wikitext dataset itself must be provided as a
token file (this environment has no network egress); any int32 token array
works — ``evaluate_ppl`` is dataset-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.model import Transformer


def evaluate_ppl(
    model: Transformer,
    params: Dict[str, Any],
    tokens: np.ndarray,      # [T] int32 token stream
    *,
    seq_len: int = 2048,
    stride: Optional[int] = None,
    max_windows: Optional[int] = None,
) -> float:
    """Perplexity = exp(mean NLL of next-token predictions), computed over
    non-overlapping windows by default (the lm-eval convention for
    wikitext word-level ppl matches the reference's usage)."""
    if stride is None:
        stride = seq_len
    tokens = np.asarray(tokens, np.int32)
    n = (len(tokens) - 1) // stride
    if max_windows is not None:
        n = min(n, max_windows)
    assert n > 0, "token stream too short"

    @jax.jit
    def window_nll(p, toks):
        logits, _ = model(p, toks[None, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = toks[None, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return jnp.sum(nll), nll.size

    total, count = 0.0, 0
    for i in range(n):
        chunk = tokens[i * stride : i * stride + seq_len + 1]
        if len(chunk) < seq_len + 1:
            break
        s, c = window_nll(params, jnp.asarray(chunk))
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))
