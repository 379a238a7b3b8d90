"""Wanda pruning: weight magnitude × input-activation norm.

Reference: ``torchao/sparsity/wanda.py`` (WandaSparsifier). Score
``|W| · ‖x‖₂`` per weight element (activation norms per in-feature from
calibration), prune lowest-scoring fraction per output row.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class WandaSparsifier:
    sparsity_level: float = 0.5
    semi_structured_block_size: Optional[int] = None  # e.g. 4 for 2:4

    def compute_mask(
        self, w: jnp.ndarray, act_norm: jnp.ndarray
    ) -> jnp.ndarray:
        """w: [N, K]; act_norm: [K] (L2 norms of calibration inputs)."""
        score = jnp.abs(w.astype(jnp.float32)) * act_norm[None, :]
        if self.semi_structured_block_size:
            b = self.semi_structured_block_size
            keep = b // 2
            g = score.reshape(w.shape[0], -1, b)
            order = jnp.argsort(g, axis=-1)
            ranks = jnp.argsort(order, axis=-1)
            return (ranks >= b - keep).reshape(w.shape)
        k_prune = int(w.shape[1] * self.sparsity_level)
        thresh = jnp.sort(score, axis=1)[:, k_prune - 1:k_prune]
        return score > thresh

    def prune(self, w: jnp.ndarray, act_norm: jnp.ndarray) -> jnp.ndarray:
        return w * self.compute_mask(w, act_norm).astype(w.dtype)
