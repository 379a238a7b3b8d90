"""SpinQuant rotations for the stacked-layer Llama param tree.

Covers the reference's ``prototype/spinquant/spinquant.py``
(``apply_spinquant`` and its ``apply_spinquant_r1/r2/r4`` steps): rotate
weights by orthogonal (randomized Hadamard) matrices so the float
function is unchanged while weight outliers spread across channels,
improving low-bit quantization.

- **R1** (residual stream, offline): fold RMSNorm weights into the
  adjacent linears, then rotate the residual basis by R1 [D, D]:
    embeddings      E' = E·R1
    norm weights    folded to ones (absorbed into consuming linears)
    in-projections  W' = W·R1        (wqkv, w13, output head)
    out-projections W' = R1ᵀ·W       (wo, w2)
- **R2** (head-dim v/o rotation, offline): a [Dh, Dh] rotation of each
  value head. Attention mixes value vectors linearly with softmax
  weights computed from q/k (untouched), so rotating every v head by
  the same R2 and un-rotating inside wo is exact — including GQA,
  where one rotated kv head serves several q heads:
    v rows of wqkv (per kv head)   W' = R2ᵀ·W_h
    wo columns (per q head)        W' = W_h·R2
- **R4** (FFN activation, *online*): the SwiGLU gate output is rotated
  by a Hadamard right before w2; w2 absorbs the inverse offline:
  with h' = h·H₄ online and W2' = W2·H₄ folded,
  h'·W2'ᵀ = h·H₄·H₄ᵀ·W2ᵀ = h·W2ᵀ (orthogonality).
  The online side is ``hadamard_utils.apply_hadamard`` — a
  Kronecker-factored O(I·(m+p)) MXU transform, the TPU replacement for
  the reference's CUDA ``fast_hadamard_transform`` kernel. Enable it in
  the model with ``ModelArgs.use_r4_hadamard=True`` (see
  ``models/llama/model.py``).

- **R3** (q/k head-dim rotation, *online*): enabled with
  ``ModelArgs.use_r3_hadamard=True`` — an orthonormal per-head Hadamard
  on q and k after RoPE. Attention scores are invariant
  ((q·H)(k·H)ᵀ = q·kᵀ) so no weights change; the point is flattening
  K's outliers before the quantized (int8/int4) KV cache quantizes
  per-token (measured ≥6 dB int4-KV fidelity gain on outlier-heavy
  keys — tests/test_spinquant.py::TestR3). Works with the Pallas
  quantized-KV attention unchanged, since the rotation happens before
  cache write.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torchao_tpu.prototype.spinquant.hadamard_utils import (
    apply_hadamard,
    deterministic_orthogonal,
    hadamard_matrix,
    is_hadamard_order,
    random_hadamard_matrix,
)


def _fold_norm_into(w: jnp.ndarray, norm_w: jnp.ndarray) -> jnp.ndarray:
    """W·diag(norm) — absorb a pre-norm's per-channel weight into the
    consuming linear ([..., N, K] weight, norm over K)."""
    return (
        w.astype(jnp.float32) * norm_w.astype(jnp.float32)[..., None, :]
    ).astype(w.dtype)


def r4_matrix(intermediate_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """The (deterministic) online R4 matrix for a given FFN width —
    must match what ``apply_hadamard`` applies at run time."""
    if is_hadamard_order(intermediate_size):
        return hadamard_matrix(intermediate_size, dtype)
    return deterministic_orthogonal(intermediate_size, dtype)


def _apply_r2(
    wqkv: jnp.ndarray,  # [L, (H+2·Hkv)·Dh, D]
    wo: jnp.ndarray,    # [L, D, H·Dh]
    head_dim: int,
    n_head: int,
    n_local_heads: int,
    R2: jnp.ndarray,    # [Dh, Dh]
):
    Dh, H, Hkv = head_dim, n_head, n_local_heads
    L, QKV, D = wqkv.shape
    assert QKV == (H + 2 * Hkv) * Dh, (QKV, H, Hkv, Dh)
    v0 = (H + Hkv) * Dh
    wv = wqkv[:, v0:, :].reshape(L, Hkv, Dh, D).astype(jnp.float32)
    wv = jnp.einsum("ed,lhdk->lhek", R2.T, wv).reshape(L, Hkv * Dh, D)
    wqkv = jnp.concatenate(
        [wqkv[:, :v0, :], wv.astype(wqkv.dtype)], axis=1
    )
    woh = wo.reshape(L, D, H, Dh).astype(jnp.float32)
    woh = jnp.einsum("ldhe,ef->ldhf", woh, R2)
    wo = woh.reshape(L, D, H * Dh).astype(wo.dtype)
    return wqkv, wo


def apply_spinquant(
    params: Dict[str, Any],
    key=None,
    *,
    r1: bool = True,
    r2: bool = False,
    r4: bool = False,
    head_dim: Optional[int] = None,
    n_head: Optional[int] = None,
    n_local_heads: Optional[int] = None,
) -> Dict[str, Any]:
    """Returns rotated params (functionally equivalent in float).

    ``r2`` needs the attention geometry (``head_dim``/``n_head``/
    ``n_local_heads``). ``r4`` folds the online Hadamard into w2; run
    the model with ``ModelArgs.use_r4_hadamard=True`` afterwards or the
    function is no longer equivalent.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    emb = params["tok_embeddings"]["weight"]
    D = emb.shape[-1]

    layers = params["layers"]
    attn_norm = layers["attention_norm"]["weight"]       # [L, D]
    ffn_norm = layers["ffn_norm"]["weight"]              # [L, D]
    final_norm = params["norm"]["weight"]                # [D]

    if r1:
        R = random_hadamard_matrix(D, k1, jnp.float32)
    else:
        R = jnp.eye(D, dtype=jnp.float32)

    def in_proj(w, norm):  # W·diag(norm)·R ;  w [L, N, D]
        wf = _fold_norm_into(w, norm).astype(jnp.float32)
        return jnp.einsum("...nd,de->...ne", wf, R).astype(w.dtype)

    def out_proj(w):  # Rᵀ·W ;  w [L, D, K]
        return jnp.einsum(
            "dn,...nk->...dk", R.T, w.astype(jnp.float32)
        ).astype(w.dtype)

    wqkv = in_proj(layers["attention"]["wqkv"], attn_norm)
    wo = out_proj(layers["attention"]["wo"])
    if r2:
        assert head_dim and n_head and n_local_heads, (
            "r2 needs head_dim / n_head / n_local_heads"
        )
        R2 = random_hadamard_matrix(head_dim, k2, jnp.float32)
        wqkv, wo = _apply_r2(
            wqkv, wo, head_dim, n_head, n_local_heads, R2
        )

    w2 = out_proj(layers["feed_forward"]["w2"])  # [L, D, I]
    if r4:
        I = w2.shape[-1]
        H4 = r4_matrix(I, jnp.float32)
        w2 = jnp.einsum(
            "...di,ij->...dj", w2.astype(jnp.float32), H4
        ).astype(w2.dtype)

    new = {
        "tok_embeddings": {
            "weight": jnp.einsum(
                "vd,de->ve", emb.astype(jnp.float32), R
            ).astype(emb.dtype)
        },
        "layers": {
            "attention": {"wqkv": wqkv, "wo": wo},
            "feed_forward": {
                "w13": in_proj(layers["feed_forward"]["w13"], ffn_norm),
                "w2": w2,
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
