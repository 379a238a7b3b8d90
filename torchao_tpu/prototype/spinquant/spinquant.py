"""SpinQuant R1 rotation for the stacked-layer Llama param tree.

Covers the reference's ``prototype/spinquant/spinquant.py``
(``apply_spinquant``): fold RMSNorm weights into the adjacent linears,
then rotate the residual stream by an orthogonal (randomized Hadamard)
matrix R — the float function is unchanged while weight outliers spread
across channels, improving low-bit quantization.

Transformation (residual x → x·R):
  embeddings      E' = E·R
  norm weights    folded to ones (absorbed into consuming linears)
  in-projections  W' = W·R         (wqkv, w1, w3, output head)
  out-projections W' = Rᵀ·W        (wo, w2)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from torchao_tpu.prototype.spinquant.hadamard_utils import (
    random_hadamard_matrix,
)


def _fold_norm_into(w: jnp.ndarray, norm_w: jnp.ndarray) -> jnp.ndarray:
    """W·diag(norm) — absorb a pre-norm's per-channel weight into the
    consuming linear ([..., N, K] weight, norm over K)."""
    return (
        w.astype(jnp.float32) * norm_w.astype(jnp.float32)[..., None, :]
    ).astype(w.dtype)


def apply_spinquant(
    params: Dict[str, Any], key=None
) -> Dict[str, Any]:
    """Returns rotated params (functionally equivalent in float)."""
    emb = params["tok_embeddings"]["weight"]
    D = emb.shape[-1]
    R = random_hadamard_matrix(D, key, jnp.float32)

    layers = params["layers"]
    attn_norm = layers["attention_norm"]["weight"]       # [L, D]
    ffn_norm = layers["ffn_norm"]["weight"]              # [L, D]
    final_norm = params["norm"]["weight"]                # [D]

    def in_proj(w, norm):  # W·diag(norm)·R ;  w [L, N, D]
        wf = _fold_norm_into(w, norm).astype(jnp.float32)
        return jnp.einsum("...nd,de->...ne", wf, R).astype(w.dtype)

    def out_proj(w):  # Rᵀ·W ;  w [L, D, K]
        return jnp.einsum(
            "dn,...nk->...dk", R.T, w.astype(jnp.float32)
        ).astype(w.dtype)

    new = {
        "tok_embeddings": {
            "weight": jnp.einsum(
                "vd,de->ve", emb.astype(jnp.float32), R
            ).astype(emb.dtype)
        },
        "layers": {
            "attention": {
                "wqkv": in_proj(layers["attention"]["wqkv"], attn_norm),
                "wo": out_proj(layers["attention"]["wo"]),
            },
            "feed_forward": {
                "w1": in_proj(layers["feed_forward"]["w1"], ffn_norm),
                "w3": in_proj(layers["feed_forward"]["w3"], ffn_norm),
                "w2": out_proj(layers["feed_forward"]["w2"]),
            },
            "attention_norm": {
                "weight": jnp.ones_like(attn_norm)
            },
            "ffn_norm": {"weight": jnp.ones_like(ffn_norm)},
        },
        "norm": {"weight": jnp.ones_like(final_norm)},
    }
    if "output" in params:
        w = params["output"]["weight"]  # [V, D]
        wf = (
            w.astype(jnp.float32) * final_norm.astype(jnp.float32)[None, :]
        )
        new["output"] = {
            "weight": jnp.einsum("vd,de->ve", wf, R).astype(w.dtype)
        }
    return new
