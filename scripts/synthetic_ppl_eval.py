"""Synthetic-corpus perplexity eval through the full harness.

The BASELINE accuracy gate (wikitext ppl deltas, reference
``torchao/_models/llama/eval.py:32-150`` + ``quantization/README.md:16-22``)
needs real weights and a real corpus — both unavailable here (zero
egress). This script exercises the identical code path end-to-end on a
model *trained* on a synthetic Markov corpus, so the deltas are
meaningful and the ordering claims (GPTQ < RTN, int8 ≈ lossless) are
measured rather than assumed; dropping in a real checkpoint + token file
is `--tokens <file.npy> --model Llama-3-8B --checkpoint <ckpt>`.

Usage: python scripts/synthetic_ppl_eval.py [--steps 800] [--recipes ...]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny-debug")
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir (skips synthetic training)")
    ap.add_argument("--tokens", default=None,
                    help=".npy int32 token file (skips the Markov corpus)")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument(
        "--recipes", nargs="*",
        default=["int8wo", "int4wo-32", "int4wo-32-gptq", "int4wo-32-hqq"],
    )
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu and args.model == "tiny-debug":
        jax.config.update("jax_platforms", "cpu")

    from torchao_tpu.models.llama.eval import evaluate_ppl
    from torchao_tpu.models.llama.model import (
        Transformer,
        default_linear_filter,
    )
    from torchao_tpu.models.llama.cli import config_from_recipe
    from torchao_tpu.quantization.gptq_llama import gptq_quantize_llama
    from torchao_tpu.quantization.quant_api import quantize_
    from torchao_tpu.testing.synthetic import (
        markov_corpus,
        train_tiny_llama,
    )

    model = Transformer.from_name(args.model, dtype=jnp.float32)

    if args.tokens:
        toks = np.load(args.tokens).astype(np.int32)
        theo = float("nan")
    else:
        toks, theo = markov_corpus(0, 256, 40000)

    if args.checkpoint:
        from torchao_tpu.checkpoint import load_quantized

        params = load_quantized(args.checkpoint)
    else:
        params = model.init_params(jax.random.PRNGKey(0))
        t0 = time.time()
        params, loss = train_tiny_llama(
            model, params, toks[: int(len(toks) * 0.8)],
            steps=args.steps, seq_len=args.seq_len,
        )
        print(f"# trained {args.steps} steps in {time.time()-t0:.0f}s "
              f"(loss {loss:.3f}, corpus theoretical ppl {theo:.3f})")

    test = toks[int(len(toks) * 0.8):]
    rows = []
    ppl_bf16 = evaluate_ppl(model, params, test, seq_len=args.seq_len)
    rows.append(("float (none)", ppl_bf16, 0.0))

    for recipe in args.recipes:
        if recipe.endswith("-gptq"):
            g = int(recipe.split("-")[1])
            calib = np.stack(
                [test[i * args.seq_len:(i + 1) * args.seq_len]
                 for i in range(32)]
            )
            q = gptq_quantize_llama(
                model, params, jnp.asarray(calib), group_size=g
            )
        else:
            q = quantize_(
                params, config_from_recipe(recipe), default_linear_filter
            )
        ppl = evaluate_ppl(model, q, test, seq_len=args.seq_len)
        rows.append((recipe, ppl, ppl - ppl_bf16))

    print(f"{'recipe':>16} | {'ppl':>8} | {'delta':>7}")
    for name, ppl, d in rows:
        print(f"{name:>16} | {ppl:8.4f} | {d:+7.4f}")


if __name__ == "__main__":
    main()
