"""Structured (channel) pruning.

Functional redesign of the reference's ``prototype/sparsity/pruner/``
(``base_structured_sparsifier.py``, ``saliency_pruner.py``,
``FPGM_pruner.py``, ``prune_functions.py``). The reference traces the
module graph with torch.fx and rewrites ``nn.Linear``/``nn.Conv`` pairs
in place; that machinery exists because PyTorch modules hide the
dataflow. A params pytree doesn't — the producer/consumer pair is
explicit — so the TPU-native API is:

- *scorers* rank output channels of a weight (``saliency_scores`` = L1
  per row; ``fpgm_scores`` = summed distance to all other rows, the
  Filter-Pruning-via-Geometric-Median criterion — rows closest to the
  geometric median are the most redundant);
- ``channel_mask`` turns scores + a fraction into a boolean keep-mask;
- ``prune_channel_pair`` *physically shrinks* a producer weight's rows
  and every consumer weight's matching columns (the analog of the
  reference's ``prune_linear_linear`` / fx propagation). Static shapes
  out — XLA recompiles once for the smaller model and the MXU does
  proportionally less work, which is the honest TPU version of
  "structured sparsity speedup".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def saliency_scores(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel L1 saliency (reference ``saliency_pruner.py``:
    lowest saliency rows are pruned). w: [..., N, K] → [..., N]."""
    return jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=-1)


def fpgm_scores(w: jnp.ndarray, p: int = 2) -> jnp.ndarray:
    """Summed pairwise Lp distance of each row to all others (reference
    ``FPGM_pruner.py``). Small score = close to the geometric median =
    redundant. w: [N, K] → [N]."""
    wf = w.astype(jnp.float32).reshape(w.shape[0], -1)
    # pairwise distances via the Gram expansion (no [N, N, K] blowup)
    sq = jnp.sum(wf * wf, axis=-1)
    gram = wf @ wf.T
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
    if p == 2:
        d = jnp.sqrt(d2 + 1e-12)
    else:
        d = d2 ** (p / 2.0)
    return jnp.sum(d, axis=-1)


def channel_mask(
    scores: jnp.ndarray, prune_fraction: float
) -> np.ndarray:
    """Boolean keep-mask over channels: drop the lowest-scoring
    ``prune_fraction`` (host-side — pruning changes shapes, so this is
    inherently a recompile boundary, not a jit op)."""
    s = np.asarray(scores)
    n = s.shape[-1]
    k_prune = int(n * prune_fraction)
    if k_prune == 0:
        return np.ones(n, bool)
    idx = np.argsort(s)[:k_prune]
    keep = np.ones(n, bool)
    keep[idx] = False
    return keep


def prune_channel_pair(
    producer: jnp.ndarray,                  # [N, K] — rows pruned
    consumers: Sequence[jnp.ndarray],       # each [M, N] — cols pruned
    prune_fraction: float,
    scorer=saliency_scores,
    producer_bias: Optional[jnp.ndarray] = None,
    extra_producers: Sequence[jnp.ndarray] = (),
) -> Tuple:
    """Shrink a producer linear's output channels and the matching input
    columns of every consumer (reference ``prune_functions.py``
    ``prune_linear_linear`` / ``prune_linear_activation_linear``).

    ``extra_producers`` share the producer's channel axis and keep-mask
    (e.g. the gate/up pair w1/w3 of a SwiGLU MLP, where the elementwise
    product ties their output channels together — the scores are summed
    across all producers before ranking).

    Returns ``(producer', [extra'...], [consumers'], keep_mask)``.
    """
    score = scorer(producer)
    for ep in extra_producers:
        score = score + scorer(ep)
    keep = channel_mask(score, prune_fraction)
    kidx = np.nonzero(keep)[0]
    new_producer = producer[kidx, :]
    new_extra = [ep[kidx, :] for ep in extra_producers]
    new_consumers = [c[:, kidx] for c in consumers]
    new_bias = producer_bias[kidx] if producer_bias is not None else None
    out = (new_producer, new_extra, new_consumers, keep)
    return out if new_bias is None else out + (new_bias,)


def prune_ffn(
    lw: dict, prune_fraction: float, scorer=saliency_scores
) -> dict:
    """Prune a Llama-style SwiGLU FFN dict ``{w1, w3, w2}`` (stacked
    ``[L, I, D]`` / ``[L, D, I]`` or single-layer ``[I, D]`` / ``[D, I]``)
    — shrinks the intermediate dimension, layer by layer when stacked."""
    w1, w3, w2 = lw["w1"], lw["w3"], lw["w2"]
    if w1.ndim == 2:
        p, extra, cons, _ = prune_channel_pair(
            w1, [w2], prune_fraction, scorer, extra_producers=[w3]
        )
        return {"w1": p, "w3": extra[0], "w2": cons[0]}
    outs1, outs3, outs2 = [], [], []
    for l in range(w1.shape[0]):
        p, extra, cons, _ = prune_channel_pair(
            w1[l], [w2[l]], prune_fraction, scorer,
            extra_producers=[w3[l]],
        )
        outs1.append(p)
        outs3.append(extra[0])
        outs2.append(cons[0])
    return {
        "w1": jnp.stack(outs1),
        "w3": jnp.stack(outs3),
        "w2": jnp.stack(outs2),
    }
