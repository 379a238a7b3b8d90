"""Mixtral-style MoE decoder.

Equivalent of the reference's ``torchao/_models/mixtral-moe`` (gpt-fast
Mixtral): the Llama decoder with the FFN replaced by a top-2-of-E MoE.
Re-uses all Llama components; the MoE FFN offers two execution paths:

- ``dense`` (default for small batch / tests): every expert computed,
  outputs mixed by router weights — one big batched einsum, no
  data-dependent shapes (jit-friendly).
- ``ragged``: tokens sorted by expert + ``jax.lax.ragged_dot`` grouped
  GEMM (TPU-efficient at scale; used by ``quantized_grouped_linear``).

Expert weights are stacked ``[L, E, N, K]`` so layer-scan and expert
quantization (``MoEQuantConfig``) compose with no special casing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.models.llama.model import (
    ModelArgs,
    _attention,
    _layer_weight,
    precompute_freqs_cis,
    rms_norm,
)
from torchao_tpu.qtypes.base import QuantizedArray


@dataclasses.dataclass
class MoEModelArgs(ModelArgs):
    num_experts: int = 8
    num_activated_experts: int = 2


moe_configs = {
    "Mixtral-8x7B-v0.1": dict(
        block_size=32768, n_layer=32, n_head=32, n_local_heads=8,
        dim=4096, intermediate_size=14336, rope_base=1000000,
        vocab_size=32000, num_experts=8, num_activated_experts=2,
    ),
    "tiny-moe": dict(
        block_size=128, vocab_size=512, n_layer=2, n_head=4,
        n_local_heads=2, dim=64, intermediate_size=128, rope_base=10000,
        num_experts=4, num_activated_experts=2,
    ),
    # hardware benchmark scale (full 8x7B int4 is ~29 GB — over a v5e
    # chip's HBM): Mixtral routing/expert structure at a dim that
    # keeps every kernel shape production-legal (Dh=128, N%128==0)
    "mixtral-essence": dict(
        block_size=4096, vocab_size=32000, n_layer=16, n_head=16,
        n_local_heads=8, dim=2048, intermediate_size=4096,
        rope_base=1000000, num_experts=8, num_activated_experts=2,
    ),
}


def _moe_ffn(
    x: jnp.ndarray, lw: Dict[str, Any], args: MoEModelArgs,
    mode: str = "dense",
):
    """Top-k routed SwiGLU MoE.

    ``dense``: every expert computes every token, outputs mixed by router
    weights — best for tiny batches / tests (no data movement).
    ``ragged``: (token, k) pairs sorted by expert + ``lax.ragged_dot``
    grouped GEMMs — each token touches only its routed experts, the
    TPU-efficient path at scale (static shapes: T·k rows, argsort +
    scatter-unsort).
    """
    B, T, D = x.shape
    E, K = args.num_experts, args.num_activated_experts
    xt = x.reshape(-1, D)
    Tt = xt.shape[0]

    router_logits = ops.linear(xt, _layer_weight(lw["gate"]))  # [T*, E]
    weights = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_w, top_idx = jax.lax.top_k(weights, K)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    w1 = _layer_weight(lw["w1"])  # [E, I, D] (possibly quantized)
    w2 = _layer_weight(lw["w2"])  # [E, D, I]
    w3 = _layer_weight(lw["w3"])  # [E, I, D]

    def dq(w):
        return w.dequantize(x.dtype) if isinstance(w, QuantizedArray) else w

    if mode == "ragged":
        from torchao_tpu.prototype.moe_quant import (
            quantized_grouped_linear,
        )

        e_flat = top_idx.reshape(-1)                    # [T*·K]
        order = jnp.argsort(e_flat)                     # expert-sorted
        tok_of_row = order // K
        x_sorted = xt[tok_of_row]                       # [T*·K, D]
        group_sizes = jnp.bincount(e_flat, length=E).astype(jnp.int32)

        h1 = quantized_grouped_linear(x_sorted, group_sizes, w1)
        h3 = quantized_grouped_linear(x_sorted, group_sizes, w3)
        h = jax.nn.silu(h1) * h3
        o_sorted = quantized_grouped_linear(
            h.astype(x.dtype), group_sizes, w2
        )                                               # [T*·K, D]
        gate_w = top_w.reshape(-1)[order].astype(o_sorted.dtype)
        contrib = o_sorted * gate_w[:, None]
        out = jnp.zeros((Tt, D), contrib.dtype).at[tok_of_row].add(contrib)
        return out.reshape(B, T, D).astype(x.dtype)

    # dense mixing matrix [T*, E]: renormalized top-k router weights
    mix = jax.nn.one_hot(top_idx, E, dtype=weights.dtype) * top_w[..., None]
    mix = jnp.sum(mix, axis=1)  # [T*, E]
    h1 = jnp.einsum("td,eid->tei", xt, dq(w1))
    h3 = jnp.einsum("td,eid->tei", xt, dq(w3))
    h = jax.nn.silu(h1) * h3
    out = jnp.einsum("tei,edi->ted", h, dq(w2))
    out = jnp.einsum("ted,te->td", out, mix.astype(out.dtype))
    return out.reshape(B, T, D).astype(x.dtype)


def _merge_expert_axis(w, E: int):
    """[L, E, ...] expert stack -> [L·E, ...] (free leading reshape) so
    a (layer, expert) pair indexes as the flat scalar ``l·E + e``
    through the kernels' scalar-prefetch path."""
    if isinstance(w, QuantizedArray):
        return w.merge_leading(2)
    return w.reshape((-1,) + w.shape[2:])


def _moe_ffn_gathered(
    x: jnp.ndarray, moe: Dict[str, Any], args: MoEModelArgs, layer_idx,
):
    """Decode MoE FFN that streams ONLY the routed experts (B·T == 1).

    The reference's Mixtral harness conditionally computes just the
    top-k experts per token (``_models/mixtral-moe/model.py`` forward);
    the dense/ragged paths here instead read every expert's bytes —
    fine for prefill/batch, 4× the HBM traffic a top-2-of-8 decode
    step needs. TPU-natively the conditional gather is a scalar-prefetch
    index: expert stacks [L, E, ...] merge to [L·E, ...] (free reshape)
    and each routed expert's linear rides the SAME stacked Pallas path
    as a dense-model layer, with flat index ``l·E + e`` (traced)."""
    B, T, D = x.shape
    E, K = args.num_experts, args.num_activated_experts
    xt = x.reshape(-1, D)
    assert xt.shape[0] == 1, "gathered mode is the single-token decode path"

    router_logits = ops.linear(xt, moe["gate"], layer_idx=layer_idx)
    weights = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_w, top_idx = jax.lax.top_k(weights, K)          # [1, K]
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    w1 = _merge_expert_axis(moe["w1"], E)
    w2 = _merge_expert_axis(moe["w2"], E)
    w3 = _merge_expert_axis(moe["w3"], E)

    out = jnp.zeros((1, D), jnp.float32)
    for j in range(K):
        fl = layer_idx * E + top_idx[0, j]
        h = jax.nn.silu(
            ops.linear(xt, w1, layer_idx=fl).astype(jnp.float32)
        ) * ops.linear(xt, w3, layer_idx=fl).astype(jnp.float32)
        o = ops.linear(h.astype(x.dtype), w2, layer_idx=fl)
        out = out + top_w[:, j, None] * o.astype(jnp.float32)
    return out.reshape(B, T, D).astype(x.dtype)


def moe_transformer_forward(
    params, tokens, input_pos, cache, freqs_full, args: MoEModelArgs,
    mask=None, moe_mode: str = "dense",
):
    B, T = tokens.shape
    if moe_mode == "auto":
        # single-token decode with the stacked smajor cache rides the
        # routed-experts-only gathered path; everything else (prefill,
        # batch) computes experts densely
        smaj = (
            isinstance(cache, dict) and "k_q" in cache
            and cache["k_q"].ndim == 4
        )
        moe_mode = "gathered" if (B * T == 1 and smaj) else "dense"
    x = ops.embedding(params["tok_embeddings"]["weight"], tokens)

    # scalar OR per-slot vector input_pos (continuous-batching engine),
    # same contract as the Llama forward (models/llama/model.py)
    vector_pos = getattr(input_pos, "ndim", 0) == 1
    if vector_pos:
        freqs = freqs_full[input_pos[:, None] + jnp.arange(T)[None, :]]
    else:
        freqs = jax.lax.dynamic_slice_in_dim(
            freqs_full, input_pos, T, axis=0
        )

    if mask is None:
        if cache is not None:
            S = jax.tree_util.tree_leaves(cache)[0].shape[3]
            if vector_pos:
                pos = input_pos[:, None, None] + jnp.arange(T)[None, :, None]
                mask = jnp.arange(S)[None, None, :] <= pos  # [B, T, S]
            else:
                pos = input_pos + jnp.arange(T)[:, None]
                mask = jnp.arange(S)[None, :] <= pos
        else:
            mask = jnp.tril(jnp.ones((T, T), bool))

    if moe_mode == "gathered":
        # decode-optimized stacked scan (mirrors the Llama forward):
        # iterate over LAYER INDICES with the stacked weights closed
        # over — quantized kernels index the layer (and routed expert)
        # via scalar prefetch; scanning sliced weights would copy every
        # weight per step (llama/model.py scan note)
        lws = params["layers"]
        layer_ids = jnp.arange(args.n_layer, dtype=jnp.int32)
        smajor_stacked = (
            cache is not None
            and isinstance(cache, dict)
            and "k_q" in cache
            and cache["k_q"].ndim == 4
        )

        def body_g(carry, l):
            x, c = carry
            lc = c if smajor_stacked else (
                None if c is None else jax.tree_util.tree_map(
                    lambda a: a[l], c
                )
            )
            h, lc2 = _attention(
                rms_norm(
                    x, lws["attention_norm"]["weight"][l], args.norm_eps
                ),
                lws["attention"], freqs, mask, lc, input_pos, args,
                layer_idx=l, stacked_cache=smajor_stacked,
            )
            x = x + h
            x = x + _moe_ffn_gathered(
                rms_norm(x, lws["ffn_norm"]["weight"][l], args.norm_eps),
                lws["block_sparse_moe"], args, l,
            )
            if smajor_stacked:
                return (x, lc2), None
            return (x, c), lc2

        if smajor_stacked:
            (x, new_cache), _ = jax.lax.scan(
                body_g, (x, cache), layer_ids
            )
        elif cache is not None:
            # per-layer cache trees can't be written back in-place from
            # an index scan — gathered decode requires the stacked
            # smajor cache (setup_caches(quantize="int8_smajor"))
            raise ValueError(
                "moe_mode='gathered' needs the stacked smajor KV cache"
            )
        else:
            (x, _), _ = jax.lax.scan(body_g, (x, None), layer_ids)
            new_cache = None
    else:
        def body(x, layer_in):
            lw, layer_cache = layer_in
            h, new_cache = _attention(
                rms_norm(x, lw["attention_norm"]["weight"], args.norm_eps),
                lw["attention"], freqs, mask, layer_cache, input_pos, args,
            )
            x = x + h
            x = x + _moe_ffn(
                rms_norm(x, lw["ffn_norm"]["weight"], args.norm_eps),
                lw["block_sparse_moe"], args, mode=moe_mode,
            )
            return x, new_cache

        if cache is not None:
            x, new_cache = jax.lax.scan(body, x, (params["layers"], cache))
        else:
            def body2(x, lw):
                x, _ = body(x, (lw, None))
                return x, None

            x, new_cache = jax.lax.scan(body2, x, params["layers"])

    x = rms_norm(x, params["norm"]["weight"], args.norm_eps)
    logits = ops.linear(x, params["output"]["weight"])
    return logits, new_cache


class MoETransformer:
    def __init__(self, args: MoEModelArgs, dtype=jnp.bfloat16,
                 moe_mode: str = "dense"):
        self.args = args
        self.dtype = dtype
        self.moe_mode = moe_mode
        self.freqs = precompute_freqs_cis(args)

    @classmethod
    def from_name(cls, name: str, dtype=jnp.bfloat16):
        return cls(MoEModelArgs(**moe_configs[name]), dtype)

    def init_params(self, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        a = self.args
        D, I, E, L = a.dim, a.intermediate_size, a.num_experts, a.n_layer
        H, Hkv, Dh, V = a.n_head, a.n_local_heads, a.head_dim, a.vocab_size
        ks = jax.random.split(key, 9)

        def init(k, shape, fan_in):
            return (
                jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)
            ).astype(self.dtype)

        qkv_out = (H + 2 * Hkv) * Dh
        return {
            "tok_embeddings": {"weight": init(ks[0], (V, D), D)},
            "layers": {
                "attention": {
                    "wqkv": init(ks[1], (L, qkv_out, D), D),
                    "wo": init(ks[2], (L, D, H * Dh), H * Dh),
                },
                "block_sparse_moe": {
                    "gate": init(ks[3], (L, E, D), D),
                    "w1": init(ks[4], (L, E, I, D), D),
                    "w3": init(ks[5], (L, E, I, D), D),
                    "w2": init(ks[6], (L, E, D, I), I),
                },
                "attention_norm": {"weight": jnp.ones((L, D), self.dtype)},
                "ffn_norm": {"weight": jnp.ones((L, D), self.dtype)},
            },
            "norm": {"weight": jnp.ones((D,), self.dtype)},
            "output": {"weight": init(ks[7], (V, D), D)},
        }

    def setup_caches(self, batch_size, max_seq_len, quantize=False):
        from torchao_tpu.models.llama.model import init_kv_cache

        return init_kv_cache(
            self.args, batch_size, min(max_seq_len, self.args.block_size),
            self.dtype, quantize,
        )

    def __call__(self, params, tokens, input_pos=0, cache=None, mask=None):
        return moe_transformer_forward(
            params, tokens, input_pos, cache, self.freqs, self.args, mask,
            moe_mode=self.moe_mode,
        )


def moe_linear_filter(path: str, leaf) -> bool:
    """Quantize attention + expert weights (not gate/embeddings/norms)."""
    names = ("wqkv", "wo", "w1", "w2", "w3", "output")
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim in (2, 3, 4)
        and any(f".{n}" in f".{path}" or path.endswith(n) for n in names)
        and "tok_embeddings" not in path
        and "norm" not in path
        and "gate" not in path
    )
