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
        "layers.feed_forward.w13": ((L, 2 * I, D), D),
        "layers.feed_forward.w2": ((L, D, I), I),
        "output.weight": ((V, D), D),
    }
    if args.tie_word_embeddings:
        shapes.pop("output.weight")
    handler = get_quantize_handler(config)

    def make(name, k):
        shape, fan_in = shapes[name]

        def init_fn(k, shp):
            w = (
                jax.random.normal(k, shp, jnp.float32)
                / math.sqrt(fan_in)
            ).astype(dtype)
            if filter_fn(name, w):
                return handler(w, config)
            return w

        # big hp temporaries (the merged w13 is [L, 2I, D] ≈ 7.5 GB f32
        # at 8B) plus quantize intermediates exceed v5e HBM: init +
        # quantize out-feature chunks separately and concatenate the
        # QUANTIZED leaves. Chunk count scales with element count so
        # temp-heavy converters (e.g. the fp6 dual-plane build) stay
        # under budget too.
        n_elems = 1
        for d in shape:
            n_elems *= d
        # out-features axis: 1 for stacked [L, N, K], 0 for 2-D [N, K]
        out_ax = 1 if len(shape) == 3 else 0
        n_chunks = 1
        while (
            n_elems // n_chunks > 150_000_000
            and shape[out_ax] % (2 * n_chunks) == 0
            # keep chunk N lane-aligned: handlers may pick storage
            # layouts by shape, and a misaligned slice must not pick a
            # different layout than the whole leaf would (round-4
            # 8da4w-head lesson)
            and (shape[out_ax] // (2 * n_chunks)) % 128 == 0
        ):
            n_chunks *= 2
        if n_chunks > 1:
            from torchao_tpu.qtypes.intx import IntxArray

            half = tuple(
                d // n_chunks if i == out_ax else d
                for i, d in enumerate(shape)
            )
            ks = jax.random.split(k, n_chunks)
            parts = []
            for kc in ks:
                p = jax.jit(init_fn, static_argnums=1)(kc, half)
                jax.block_until_ready(p)
                parts.append(p)
            from torchao_tpu.qtypes.composition import (
                LinearActivationQuantizedArray,
            )

            if (
                isinstance(parts[0], LinearActivationQuantizedArray)
                and isinstance(parts[0].original_weight, IntxArray)
            ):
                import dataclasses as _dc

                out = _dc.replace(
                    parts[0],
                    original_weight=jax.jit(IntxArray.concat_out_features)(
                        [p.original_weight for p in parts]
                    ),
                )
            elif hasattr(parts[0], "concat_out_features"):
                # IntxArray / FloatxArray(kmajor) / other sliceable types
                out = jax.jit(type(parts[0]).concat_out_features)(parts)
            elif (
                hasattr(parts[0], "qdata")
                and getattr(parts[0], "scale", None) is not None
                and parts[0].scale.ndim == parts[0].qdata.ndim
                and parts[0].scale.shape[-2] == parts[0].qdata.shape[-2]
            ):  # Float8Array-like with per-row scales
                import dataclasses as _dc

                out = _dc.replace(
                    parts[0],
                    qdata=jnp.concatenate(
                        [p.qdata for p in parts], axis=-2
                    ),
                    scale=jnp.concatenate(
                        [p.scale for p in parts], axis=-2
                    ),
                )
            elif hasattr(parts[0], "qdata"):
                # per-tensor-scale types can't concat exactly: fall back
                # to one whole-leaf init (may need more HBM headroom)
                out = jax.jit(init_fn, static_argnums=1)(k, shape)
            else:
                out = jnp.concatenate(parts, axis=-2)
            jax.block_until_ready(out)
            return out

        out = jax.jit(init_fn, static_argnums=1)(k, shape)
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
                "w13": leaves["layers.feed_forward.w13"],
                "w2": leaves["layers.feed_forward.w2"],
            },
            "attention_norm": {"weight": jnp.ones((L, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, D), dtype)},
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    if not args.tie_word_embeddings:
        params["output"] = {"weight": leaves["output.weight"]}
    else:
        params = untie_quantized_head(params, args, config, filter_fn)
    return params


def untie_quantized_head(params, args, config, filter_fn=None):
    """For tied-embedding models, materialize a QUANTIZED ``output``
    head from the (high-precision) embedding table.

    Reference semantics (gpt-fast + ``quantize_``): the output
    projection is a separate ``nn.Linear`` — tied checkpoints copy the
    embedding into it at load — so weight-only configs quantize the
    HEAD while the embedding lookup stays bf16
    (``torchao/_models/llama/model.py:243`` + ``quant_api._is_linear``).
    Without this, a tied model streams the full bf16 table every decode
    step (Llama-3.2-3B: 788 MB/step, profiled at 1.04 ms — the single
    largest op). No-op when the model is untied, the head is already
    present, the embedding itself is already quantized, or the filter
    rejects the head."""
    if not getattr(args, "tie_word_embeddings", False):
        return params
    if "output" in params:
        return params
    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.qtypes.base import QuantizedArray
    from torchao_tpu.quantization.transform_module import (
        get_quantize_handler,
    )

    if filter_fn is None:
        filter_fn = default_linear_filter
    emb = params["tok_embeddings"]["weight"]
    if isinstance(emb, QuantizedArray):
        return params  # quantized embedding serves both roles already
    if not filter_fn("output.weight", emb):
        return params
    try:
        handler = get_quantize_handler(config)
    except Exception:
        return params
    if handler is None:
        return params
    qhead = jax.jit(lambda w: handler(w, config))(emb)
    if isinstance(qhead, jnp.ndarray):
        return params  # handler declined (e.g. shape-gated)
    params = dict(params)
    params["output"] = {"weight": qhead}
    return params
