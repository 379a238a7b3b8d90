"""Sequential GPTQ for the stacked-layer Llama model.

The reference threads calibration through ``MultiTensor`` tracing
(``GPTQ/GPTQ.py:46``); here the model is functional, so calibration is an
explicit layer-by-layer sweep (the standard GPTQ-for-LLMs recipe):

  1. embed the calibration tokens;
  2. for each layer: capture the inputs of its 5 linears, accumulate
     Hessians ``H = Σ xᵀx``, GPTQ-quantize each weight
     (``gptq.gptq_quantize_weight``), then run the layer forward **with
     the quantized weights** so later layers calibrate against the
     error-compensated activations;
  3. restack per-layer results into the stacked quantized pytree.

Covers ``Int4WeightOnlyGPTQQuantizer`` (tinygemm semantics, so the
result drops into the int4 Pallas path).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import (
    ModelArgs,
    apply_rotary_emb,
    precompute_freqs_cis,
    rms_norm,
)
from torchao_tpu.quantization.gptq import (
    accumulate_hessian,
    gptq_quantize_int4,
)


def _layer_slice(layers: Dict[str, Any], i: int) -> Dict[str, Any]:
    return jax.tree_util.tree_map(lambda a: a[i], layers)


def _stack(trees: List[Any]) -> Any:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def gptq_quantize_llama(
    model,
    params: Dict[str, Any],
    tokens: jnp.ndarray,     # [B, T] calibration tokens
    group_size: int = 64,
    quantize_output_head: bool = True,
) -> Dict[str, Any]:
    """Returns params with attention/FFN (and optionally head) weights
    replaced by GPTQ-optimized tinygemm int4 arrays."""
    args: ModelArgs = model.args
    B, T = tokens.shape
    L = args.n_layer
    H, Hkv, Dh = args.n_head, args.n_local_heads, args.head_dim

    freqs_full = precompute_freqs_cis(args)
    freqs = freqs_full[:T]
    mask = jnp.tril(jnp.ones((T, T), bool))

    x = params["tok_embeddings"]["weight"][tokens]
    new_layers: List[Dict[str, Any]] = []

    def attn_with(wqkv_use, wo_use, h):
        qkv = jnp.einsum("btd,nd->btn", h, wqkv_use)
        q, k, v = jnp.split(qkv, [H * Dh, H * Dh + Hkv * Dh], axis=-1)
        q = apply_rotary_emb(q.reshape(B, T, H, Dh), freqs)
        k = apply_rotary_emb(k.reshape(B, T, Hkv, Dh), freqs)
        v = v.reshape(B, T, Hkv, Dh)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        g = H // Hkv
        qg = q.reshape(B, Hkv, g, T, Dh)
        scores = jnp.einsum(
            "bhgtd,bhsd->bhgts", qg, k,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(Dh)
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhgts,bhsd->bhgtd", p, v)
        o = o.reshape(B, H, T, Dh).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return o, jnp.einsum("btk,dk->btd", o, wo_use)

    for i in range(L):
        lw = _layer_slice(params["layers"], i)
        aw, fw = lw["attention"], lw["feed_forward"]

        h_attn = rms_norm(x, lw["attention_norm"]["weight"], args.norm_eps)
        H_qkv = accumulate_hessian(None, h_attn)
        q_wqkv = gptq_quantize_int4(aw["wqkv"], H_qkv, group_size)

        attn_in, _ = attn_with(
            q_wqkv.dequantize(jnp.float32).astype(x.dtype), aw["wo"], h_attn
        )
        H_wo = accumulate_hessian(None, attn_in)
        q_wo = gptq_quantize_int4(aw["wo"], H_wo, group_size)
        _, attn_out = attn_with(
            q_wqkv.dequantize(jnp.float32).astype(x.dtype),
            q_wo.dequantize(jnp.float32).astype(x.dtype),
            h_attn,
        )
        x = x + attn_out

        h_ffn = rms_norm(x, lw["ffn_norm"]["weight"], args.norm_eps)
        H_w13 = accumulate_hessian(None, h_ffn)
        q_w13 = gptq_quantize_int4(fw["w13"], H_w13, group_size)
        h13 = h_ffn @ q_w13.dequantize(jnp.float32).astype(x.dtype).T
        h1, h3 = jnp.split(h13, 2, axis=-1)
        inner = jax.nn.silu(h1) * h3
        H_w2 = accumulate_hessian(None, inner)
        q_w2 = gptq_quantize_int4(fw["w2"], H_w2, group_size)
        x = x + inner @ q_w2.dequantize(jnp.float32).astype(x.dtype).T

        new_layers.append(
            {
                "attention": {"wqkv": q_wqkv, "wo": q_wo},
                "feed_forward": {"w13": q_w13, "w2": q_w2},
                "attention_norm": lw["attention_norm"],
                "ffn_norm": lw["ffn_norm"],
            }
        )

    out = dict(params)
    out["layers"] = _stack(new_layers)
    if quantize_output_head and "output" in params:
        h_final = rms_norm(x, params["norm"]["weight"], args.norm_eps)
        H_out = accumulate_hessian(None, h_final)
        out = dict(out)
        out["output"] = {
            "weight": gptq_quantize_int4(
                params["output"]["weight"], H_out, group_size
            )
        }
    return out
