"""Mixtral-MoE decode benchmark (VERDICT r4 next #5).

The reference publishes Mixtral-8x7B decode rows from
``torchao/_models/mixtral-moe/generate.py``; full 8x7B in int4 is
~29 GB — beyond one v5e chip — so this runs the
``mixtral-essence`` scale (16 layers, dim 2048, 8 experts top-2,
production-legal kernel shapes) the way the 3B Llama row scales the
dense model, with int4wo experts via the MoE filter.

Three expert execution paths are A/B'd at decode:
  gathered — routed-experts-only streaming via scalar-prefetch flat
             (layer, expert) indexing (the TPU shape of the
             reference's conditional expert compute)
  dense    — every expert computed, router-mixed
  ragged   — expert-sorted rows + lax.ragged_dot grouped GEMM

Usage: python benchmarks/mixtral_bench.py [--prompt 128] [--tokens 64]
       [--modes auto,dense,ragged]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.mixtral import (
    MoEModelArgs,
    MoETransformer,
    moe_configs,
    moe_linear_filter,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import get_model_size_in_bytes


def init_quantized_moe(model, config, key):
    """Leaf-by-leaf random init + quantize (the llama init_utils
    pattern): materializing the full bf16 MoE (~7 GB) plus quantize
    copies OOMs the v5e — each leaf's hp weight lives only inside one
    jit call."""
    import math

    from torchao_tpu.quantization.transform_module import (
        get_quantize_handler,
    )

    a = model.args
    D, I, E, L = a.dim, a.intermediate_size, a.num_experts, a.n_layer
    H, Hkv, Dh, V = a.n_head, a.n_local_heads, a.head_dim, a.vocab_size
    qkv_out = (H + 2 * Hkv) * Dh
    dtype = model.dtype
    handler = get_quantize_handler(config)

    shapes = {
        "tok_embeddings.weight": ((V, D), D, False),
        "layers.attention.wqkv": ((L, qkv_out, D), D, True),
        "layers.attention.wo": ((L, D, H * Dh), H * Dh, True),
        "layers.block_sparse_moe.gate": ((L, E, D), D, False),
        "layers.block_sparse_moe.w1": ((L, E, I, D), D, True),
        "layers.block_sparse_moe.w3": ((L, E, I, D), D, True),
        "layers.block_sparse_moe.w2": ((L, E, D, I), I, True),
        "output.weight": ((V, D), D, True),
    }

    def make(name, k):
        shape, fan_in, quant = shapes[name]

        def init_fn(k):
            w = (
                jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)
            ).astype(dtype)
            return handler(w, config) if quant else w

        out = jax.jit(init_fn)(k)
        jax.block_until_ready(out)
        return out

    ks = jax.random.split(key, len(shapes))
    lv = {n: make(n, k) for n, k in zip(shapes, ks)}
    return {
        "tok_embeddings": {"weight": lv["tok_embeddings.weight"]},
        "layers": {
            "attention": {
                "wqkv": lv["layers.attention.wqkv"],
                "wo": lv["layers.attention.wo"],
            },
            "block_sparse_moe": {
                "gate": lv["layers.block_sparse_moe.gate"],
                "w1": lv["layers.block_sparse_moe.w1"],
                "w3": lv["layers.block_sparse_moe.w3"],
                "w2": lv["layers.block_sparse_moe.w2"],
            },
            "attention_norm": {"weight": jnp.ones((L, D), dtype)},
            "ffn_norm": {"weight": jnp.ones((L, D), dtype)},
        },
        "norm": {"weight": jnp.ones((D,), dtype)},
        "output": {"weight": lv["output.weight"]},
    }


def active_bytes_per_token(params, args: MoEModelArgs) -> float:
    """HBM bytes a routed decode step must read: full attention/head
    weights + top-k of E experts."""
    total = 0.0
    lws = params["layers"]
    for name in ("wqkv", "wo"):
        total += get_model_size_in_bytes({"w": lws["attention"][name]})
    moe = lws["block_sparse_moe"]
    frac = args.num_activated_experts / args.num_experts
    for name in ("w1", "w2", "w3"):
        total += frac * get_model_size_in_bytes({"w": moe[name]})
    total += get_model_size_in_bytes({"w": moe["gate"]})
    total += get_model_size_in_bytes({
        "a": params["output"]["weight"],
        "c": params["norm"], "d": lws["attention_norm"],
        "e": lws["ffn_norm"],
    })
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mixtral-essence")
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="auto,dense,ragged")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from torchao_tpu.models.llama.generate import benchmark_decode

    name = "tiny-moe" if args.small else args.model
    margs = MoEModelArgs(**moe_configs[name])
    margs.block_size = min(margs.block_size, args.prompt + args.tokens + 64)
    model = MoETransformer(margs, dtype=jnp.bfloat16)

    t0 = time.time()
    params = init_quantized_moe(
        model, Int4WeightOnlyConfig(group_size=32), jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    print(f"init+quantize (leaf-by-leaf): {time.time()-t0:.1f}s", flush=True)

    model_gb = get_model_size_in_bytes(params) / 1e9
    act_gb = active_bytes_per_token(params, margs) / 1e9
    print(
        f"model {model_gb:.2f} GB; active read/token {act_gb:.3f} GB "
        f"(top-{margs.num_activated_experts}/{margs.num_experts})",
        flush=True,
    )

    results = {}
    for mode in args.modes.split(","):
        model.moe_mode = mode
        res = benchmark_decode(
            model, params,
            prompt_len=args.prompt, num_tokens=args.tokens,
            kv_cache_quantization="int8_smajor" if mode == "auto"
            else "int8",
            iters=args.iters,
        )
        toks = res["tokens_per_s"]
        eff = act_gb * toks if mode == "auto" else None
        results[mode] = {
            "tok_s": round(toks, 2),
            "ttft_p50_ms": round(res["ttft_p50_ms"], 1),
            **(
                {"active_bw_GBps": round(eff, 1)}
                if eff is not None else {}
            ),
        }
        print(json.dumps({mode: results[mode]}), flush=True)

    print(json.dumps({
        "metric": "mixtral_moe_decode",
        "model": name,
        "model_size_GB": round(model_gb, 3),
        "active_read_GB_per_tok": round(act_gb, 3),
        "prompt": args.prompt,
        "num_tokens": args.tokens,
        **results,
    }), flush=True)


if __name__ == "__main__":
    main()
