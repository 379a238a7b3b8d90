"""Benchmark the headline quantization configs on Llama-3-8B decode
(BASELINE.json configs 2-4), appending reference-style result lines to
benchmark_results.txt.

Usage: python benchmarks/llama_configs_bench.py [--recipes int8wo,int4wo-32]
Each recipe is one full model init+quantize+compile+decode cycle (minutes
each over the remote-compile tunnel).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def bench_recipe(recipe: str, num_tokens=128, prompt_len=128):
    import bench
    from torchao_tpu.models.llama.cli import config_from_recipe
    from torchao_tpu.models.llama.generate import benchmark_decode
    from torchao_tpu.models.llama.model import (
        ModelArgs,
        Transformer,
        default_linear_filter,
    )

    args = ModelArgs.from_name("Llama-3-8B")
    args.block_size = 4096
    model = Transformer(args, dtype=jnp.bfloat16)
    cfg = None if recipe in ("bf16", "none") else config_from_recipe(recipe)

    t0 = time.time()
    if cfg is None:
        params = bench.init_quantized_llama(
            model, _IdentityConfig(), lambda p, l: False,
            jax.random.PRNGKey(0),
        )
    else:
        params = bench.init_quantized_llama(
            model, cfg, default_linear_filter, jax.random.PRNGKey(0)
        )
    init_s = time.time() - t0
    res = benchmark_decode(
        model, params, batch_size=1, prompt_len=prompt_len,
        num_tokens=num_tokens,
    )
    read = bench.weight_read_bytes_per_token(params)
    out = {
        "recipe": recipe,
        "tok_s": round(res["tokens_per_s"], 2),
        "weight_read_GB_per_tok": round(read / 1e9, 3),
        "eff_bw_GBps": round(res["tokens_per_s"] * read / 1e9, 1),
        "model_size_GB": round(res["model_size_GB"], 3),
        "init_s": round(init_s, 1),
    }
    line = (
        f"{time.strftime('%Y%m%d%H%M%S')}, tok/s={out['tok_s']:8.2f}, "
        f"mem/s={out['eff_bw_GBps']:8.2f} GB/s, "
        f"model_size={out['model_size_GB']:.2f} GB, quant: {recipe}, "
        f"model: Llama-3-8B (random weights, v5e-slice)"
    )
    print(json.dumps(out), flush=True)
    with open(
        os.path.join(os.path.dirname(__file__), "..",
                     "benchmark_results.txt"), "a"
    ) as f:
        f.write(line + "\n")
    return out


class _IdentityConfig:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--recipes", default="int8wo,int8dq,float8dq-row"
    )
    a = ap.parse_args()
    for r in a.recipes.split(","):
        try:
            bench_recipe(r.strip())
        except Exception as e:
            import traceback; traceback.print_exc()
            print(json.dumps({"recipe": r, "error": str(e)[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
