"""Memory-lean quantized init for full-size models.

``init_params`` + ``quantize_`` materializes the whole bf16 model before
quantizing — Llama-3-8B bf16 is ~16 GB, the full HBM of a v5e chip, so
the transform OOMs. This initializes + quantizes ONE stacked tensor at a
time inside jit (the hp weight is a temporary of each jit call), so peak
memory stays ~1 stacked hp tensor + the quantized model.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_quantized_params(model, config, filter_fn, key):
    """Random-init + quantize leaf-by-leaf (see module docstring)."""
    from torchao_tpu.quantization.transform_module import (
        get_quantize_handler,
    )

    args = model.args
    D, I = args.dim, args.intermediate_size
    H, Hkv, Dh, L = (
        args.n_head, args.n_local_heads, args.head_dim, args.n_layer,
    )
    V = args.vocab_size
    dtype = model.dtype
    qkv_out = (H + 2 * Hkv) * Dh

    shapes = {
        "tok_embeddings.weight": ((V, D), D),
        "layers.attention.wqkv": ((L, qkv_out, D), D),
        "layers.attention.wo": ((L, D, H * Dh), H * Dh),
        "layers.feed_forward.w1": ((L, I, D), D),
        "layers.feed_forward.w3": ((L, I, D), D),
        "layers.feed_forward.w2": ((L, D, I), I),
        "output.weight": ((V, D), D),
    }
    if args.tie_word_embeddings:
        shapes.pop("output.weight")
    handler = get_quantize_handler(config)

    def make(name, k):
        shape, fan_in = shapes[name]

        def init_fn(k):
            w = (
                jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)
            ).astype(dtype)
            if filter_fn(name, w):
                return handler(w, config)
            return w

        out = jax.jit(init_fn)(k)
        jax.block_until_ready(out)
        return out

    keys = jax.random.split(key, len(shapes))
    leaves = {name: make(name, k) for name, k in zip(shapes, keys)}
    params = {
        "tok_embeddings": {"weight": leaves["tok_embeddings.weight"]},
        "layers": {
            "attention": {
                "wqkv": leaves["layers.attention.wqkv"],
                "wo": leaves["layers.attention.wo"],
            },
            "feed_forward": {
                "w1": leaves["layers.feed_forward.w1"],
                "w3": leaves["layers.feed_forward.w3"],
                "w2": leaves["layers.feed_forward.w2"],
            },
            "attention_norm": {"weight": jnp.ones((L, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, D), dtype)},
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    if not args.tie_word_embeddings:
        params["output"] = {"weight": leaves["output.weight"]}
    return params
