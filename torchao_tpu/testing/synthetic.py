"""Structured synthetic data for calibration-efficacy validation.

The BASELINE accuracy gate (wikitext ppl deltas) cannot run in this
environment (zero egress — no real weights/corpora), but the *ordering*
claims of the calibration algorithms are testable without either: GPTQ,
AWQ, SpinQuant, SmoothQuant, HQQ and AutoRound all exist for specific
structure in real activations/weights — correlation and per-channel
outliers (the regimes documented in their papers and exploited by the
reference implementations, e.g. ``torchao/prototype/awq/core.py``,
``torchao/prototype/spinquant/spinquant.py``). This module generates
data with exactly that structure:

- :func:`correlated_activations` — low-rank mixed activations with a few
  large-magnitude channels (the LLM activation-outlier regime of the
  AWQ/SmoothQuant papers).
- :func:`heavy_tailed_weight` — weight matrices with outlier columns
  (the regime SpinQuant's rotations Gaussianize).
- :func:`markov_corpus` — a low-entropy synthetic token stream a tiny
  model can actually learn, so end-to-end perplexity (and its
  degradation under quantization) is *meaningful* rather than the
  ~uniform ppl of random weights. Used by ``tests/test_eval_ppl_e2e.py``
  and ``scripts/synthetic_ppl_eval.py`` to drive the full eval harness
  (the reference's ``_models/llama/eval.py`` path) so a real-weight /
  real-corpus drop is turn-key.
- :func:`train_tiny_llama` — a minimal AdamW loop over the repo's Llama.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def correlated_activations(
    sample_seed: int,
    T: int,
    K: int,
    *,
    dist_seed: int = 0,
    rank: Optional[int] = None,
    outlier_frac: float = 0.03,
    outlier_scale: float = 20.0,
    noise: float = 0.1,
) -> np.ndarray:
    """[T, K] activations: low-rank factor mixing (strong channel
    correlation — the structure GPTQ's Hessian exploits) plus a few
    channels scaled ×``outlier_scale`` (the per-channel outliers AWQ /
    SmoothQuant / SpinQuant exist for).

    ``dist_seed`` fixes the *distribution* (mixing matrix + outlier
    channel set); ``sample_seed`` draws samples from it — calibration
    and held-out sets must share ``dist_seed`` and differ in
    ``sample_seed``, like calibration and eval splits of one corpus."""
    rd = np.random.RandomState(dist_seed)
    r = rank or max(2, K // 8)
    F = rd.randn(r, K) / np.sqrt(r)
    n_out = max(1, int(K * outlier_frac))
    idx = rd.choice(K, n_out, replace=False)

    rs = np.random.RandomState(sample_seed)
    z = rs.randn(T, r)
    x = z @ F + noise * rs.randn(T, K)
    x[:, idx] *= outlier_scale
    return x.astype(np.float32)


def heavy_tailed_weight(
    seed: int,
    N: int,
    K: int,
    *,
    outlier_frac: float = 0.02,
    outlier_scale: float = 12.0,
) -> np.ndarray:
    """[N, K] weight with outlier *columns* (per-in-channel spikes) —
    group-wise int4 qparams over such a row waste most of their range
    on the spike; a Hadamard rotation spreads it across the group."""
    rs = np.random.RandomState(seed)
    w = rs.randn(N, K)
    n_out = max(1, int(K * outlier_frac))
    idx = rs.choice(K, n_out, replace=False)
    w[:, idx] *= outlier_scale
    return (w / np.sqrt(K)).astype(np.float32)


def markov_corpus(
    seed: int,
    vocab_size: int,
    length: int,
    *,
    branching: int = 4,
) -> Tuple[np.ndarray, float]:
    """A first-order Markov token stream where each state transitions to
    ``branching`` successors with Zipf-ish probabilities. Returns
    (tokens [length] int32, theoretical ppl = exp(entropy rate)) — a
    perfectly-trained model approaches the theoretical ppl, so the gap
    bf16-ppl → quantized-ppl is a real accuracy signal."""
    rs = np.random.RandomState(seed)
    succ = np.stack(
        [rs.choice(vocab_size, branching, replace=False)
         for _ in range(vocab_size)]
    )                                            # [V, B]
    p = 1.0 / (1.0 + np.arange(branching))
    p = p / p.sum()
    toks = np.empty(length, np.int32)
    s = rs.randint(vocab_size)
    for i in range(length):
        toks[i] = s
        s = succ[s, rs.choice(branching, p=p)]
    entropy = -np.sum(p * np.log(p))
    return toks, float(np.exp(entropy))


def batch_windows(
    tokens: np.ndarray, seq_len: int, batch: int, rs: np.random.RandomState
) -> np.ndarray:
    starts = rs.randint(0, len(tokens) - seq_len - 1, batch)
    return np.stack([tokens[s : s + seq_len + 1] for s in starts])


def train_tiny_llama(
    model,
    params: Dict[str, Any],
    tokens: np.ndarray,
    *,
    steps: int = 300,
    seq_len: int = 64,
    batch: int = 16,
    lr: float = 3e-3,
    seed: int = 0,
    optimizer: str = "adamw",
) -> Dict[str, Any]:
    """Minimal next-token training loop (CPU-friendly; used only to
    produce a model whose ppl is meaningfully below uniform).
    ``optimizer="sgd"`` keeps no moments — the only way a ~1.7B-param
    bf16 model (8B layer width) trains inside one v5e's HBM
    (scripts/spec_earlyexit_8b.py)."""
    import optax

    if optimizer == "sgd":
        opt = optax.sgd(lr)
    elif optimizer == "adafactor":
        # factored second moments: ~O(rows+cols) state instead of
        # AdamW's 2x params — trains the 8B-width model in HBM
        opt = optax.adafactor(learning_rate=lr)
    else:
        opt = optax.adamw(lr)
    opt_state = opt.init(params)
    rs = np.random.RandomState(seed)

    @jax.jit
    def step(params, opt_state, batch_toks):
        def loss_fn(p):
            logits, _ = model(p, batch_toks[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            tgt = batch_toks[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        b = jnp.asarray(batch_windows(tokens, seq_len, batch, rs))
        params, opt_state, loss = step(params, opt_state, b)
    return params, float(loss)
