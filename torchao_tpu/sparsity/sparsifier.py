"""Mask-based sparsifiers + sparsity-level schedulers.

Functional JAX redesign of the reference's
``prototype/sparsity/sparsifier/`` (``base_sparsifier.py``,
``weight_norm_sparsifier.py``, ``nearly_diagonal_sparsifier.py``) and
``prototype/sparsity/scheduler/`` (``base_scheduler.py``,
``lambda_scheduler.py``, ``cubic_scheduler.py``).

The reference mutates ``nn.Module`` parametrizations in place and keeps
scheduler state on the optimizer pattern. Here everything is
data-in/data-out, jit- and scan-friendly:

- a *sparsifier* is a dataclass with ``update_mask(w) -> bool mask``;
- ``prepare`` walks a params pytree and builds a parallel pytree of
  masks (the analog of attaching parametrizations);
- ``step`` recomputes masks at the (possibly scheduled) sparsity level;
- ``apply_masks`` multiplies masks in — gradient-safe, so the standard
  sparse-training loop is ``params = apply_masks(params, masks)``
  inside the loss (masked weights get zero gradient contribution
  through the multiply);
- ``squash_mask`` bakes masks into the weights and drops them (the
  reference's ``squash_mask``).

Schedulers are pure ``level(t)`` functions of the global step — compose
with the training loop however you like.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# sparsifiers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WeightNormSparsifier:
    """Block-wise L1-norm magnitude pruning (reference
    ``weight_norm_sparsifier.py``): tile the weight into
    ``sparse_block_shape`` blocks, zero the lowest-norm blocks until
    ``sparsity_level`` of blocks are off; within surviving blocks,
    additionally zero the ``zeros_per_block`` smallest entries."""

    sparsity_level: float = 0.5
    sparse_block_shape: Tuple[int, int] = (1, 4)
    zeros_per_block: Optional[int] = None

    def update_mask(
        self, w: jnp.ndarray, sparsity_level: Optional[float] = None
    ) -> jnp.ndarray:
        level = (
            self.sparsity_level if sparsity_level is None
            else sparsity_level
        )
        level = float(min(max(level, 0.0), 1.0))
        bh, bw = self.sparse_block_shape
        N, K = w.shape[-2], w.shape[-1]
        assert N % bh == 0 and K % bw == 0, (w.shape, (bh, bw))
        lead = w.shape[:-2]
        blocks = jnp.abs(w.astype(jnp.float32)).reshape(
            *lead, N // bh, bh, K // bw, bw
        )
        norms = blocks.sum(axis=(-3, -1))          # [.., N/bh, K/bw]
        flat = norms.reshape(*lead, -1)
        nb = flat.shape[-1]
        k_prune = int(nb * level)
        if k_prune == 0:
            block_keep = jnp.ones_like(norms, bool)
        else:
            thresh = jnp.sort(flat, axis=-1)[
                ..., k_prune - 1 : k_prune
            ].reshape(*lead, 1, 1)
            block_keep = norms > thresh
        mask = jnp.broadcast_to(
            block_keep[..., :, None, :, None], blocks.shape
        )
        if self.zeros_per_block:
            z = min(self.zeros_per_block, bh * bw)
            order = jnp.argsort(
                jnp.swapaxes(blocks, -3, -2).reshape(
                    *lead, N // bh, K // bw, bh * bw
                ),
                axis=-1,
            )
            ranks = jnp.argsort(order, axis=-1)
            inner = (ranks >= z).reshape(*lead, N // bh, K // bw, bh, bw)
            inner = jnp.swapaxes(inner, -3, -2)
            mask = mask & inner
        return mask.reshape(w.shape)


@dataclasses.dataclass
class NearlyDiagonalSparsifier:
    """Keep a band of width ``nearliness`` around the (scaled) diagonal
    (reference ``nearly_diagonal_sparsifier.py``): mask[i, j] = 1 iff
    |i·K/N − j| ≤ nearliness/2 — everything far from the diagonal is
    zeroed."""

    nearliness: int = 1

    def update_mask(self, w: jnp.ndarray, **_) -> jnp.ndarray:
        N, K = w.shape[-2], w.shape[-1]
        i = jnp.arange(N)[:, None] * (K / N)
        j = jnp.arange(K)[None, :]
        band = jnp.abs(i - j) <= self.nearliness / 2
        return jnp.broadcast_to(band, w.shape)


# ---------------------------------------------------------------------------
# schedulers (pure level(t) functions)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LambdaSL:
    """``level(t) = base_level · fn(t)`` (reference
    ``lambda_scheduler.py``)."""

    base_level: float
    fn: Callable[[int], float]

    def level(self, t: int) -> float:
        return float(min(max(self.base_level * self.fn(t), 0.0), 1.0))


@dataclasses.dataclass
class CubicSL:
    """Cubic sparsity ramp s_t = s_f + (s_0 − s_f)·(1 − (t−t0)/(n·Δt))³
    for t ∈ [t0, t0 + n·Δt] (reference ``cubic_scheduler.py``, the
    schedule from "To prune, or not to prune")."""

    init_level: float = 0.0
    final_level: float = 0.9
    init_t: int = 0
    delta_t: int = 1
    total_steps: int = 100  # number of Δt updates

    def level(self, t: int) -> float:
        if t < self.init_t:
            return self.init_level
        span = self.delta_t * self.total_steps
        frac = min((t - self.init_t) / max(span, 1), 1.0)
        s = self.final_level + (self.init_level - self.final_level) * (
            (1.0 - frac) ** 3
        )
        return float(s)


# ---------------------------------------------------------------------------
# pytree driver (the BaseSparsifier prepare/step/squash loop)
# ---------------------------------------------------------------------------


def _walk(params, filter_fn):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if (
            hasattr(leaf, "ndim") and leaf.ndim >= 2
            and (filter_fn is None or filter_fn(name, leaf))
        ):
            out.append((name, leaf))
    return out


def prepare(
    params,
    sparsifier,
    filter_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Build the mask pytree (dict: path → bool mask) for every leaf the
    filter selects — the analog of the reference's parametrization
    attach."""
    return {
        name: sparsifier.update_mask(leaf)
        for name, leaf in _walk(params, filter_fn)
    }


def step(
    params,
    sparsifier,
    masks: Dict[str, jnp.ndarray],
    sparsity_level: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Recompute every prepared mask (optionally at a scheduled level)."""
    by_name = dict(_walk(params, None))
    return {
        name: sparsifier.update_mask(
            by_name[name], sparsity_level=sparsity_level
        )
        if sparsity_level is not None
        else sparsifier.update_mask(by_name[name])
        for name in masks
    }


def apply_masks(params, masks: Dict[str, jnp.ndarray]):
    """Multiply masks into their weights (differentiable; use inside the
    loss for sparse training)."""

    def fix(path, leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if name in masks:
            return leaf * masks[name].astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


def squash_mask(params, masks: Dict[str, jnp.ndarray]):
    """Bake masks into the weights permanently (reference
    ``squash_mask``) — returns (params, {}) with masks consumed."""
    return apply_masks(params, masks), {}
