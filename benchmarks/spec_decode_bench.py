"""Speculative-decoding benchmark: measures decode tok/s with a small
draft model vs vanilla decode on the same target model.

NOTE on random weights: speculative speedup is proportional to the
draft/target agreement rate; with random weights the draft's argmax is
uncorrelated with the target's, so acceptance (and thus speedup) is near
zero — real gains need a real checkpoint (zero-egress here). What this
benchmark DOES measure honestly:
  - the per-round mechanical overhead of the verify path (tall-skinny
    target forward vs single-token decode),
  - the acceptance-rate bookkeeping,
  - tok/s at whatever acceptance the weights produce.
Use ``--greedy-selfcheck`` to verify on-device that speculative greedy
output matches vanilla greedy output token-for-token at full scale.

Usage:
  python benchmarks/spec_decode_bench.py [--model Llama-3-8B]
      [--draft-layers 4] [--spec-k 4] [--new-tokens 64] [--small]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Llama-3-8B")
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--greedy-selfcheck", action="store_true")
    ap.add_argument(
        "--identical-draft", action="store_true",
        help="draft = the TARGET model itself (same params). Greedy "
        "acceptance is ~1.0 (modulo bf16 tall-skinny-verify tie flips), "
        "so t_spec/t_van bounds the machinery overhead per accepted "
        "token: every gain from a cheaper real draft comes on top.",
    )
    args = ap.parse_args()

    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    if args.small:
        margs = ModelArgs(
            block_size=512, vocab_size=512, n_layer=4, n_head=8,
            n_local_heads=8, dim=256, intermediate_size=512,
        )
        model = Transformer(margs, dtype=jnp.bfloat16)
        params = quantize_(
            model.init_params(jax.random.PRNGKey(0)),
            Int4WeightOnlyConfig(group_size=32),
            default_linear_filter,
        )
        name = "tiny"
    else:
        from bench import init_quantized_llama

        margs = ModelArgs.from_name(args.model)
        margs.block_size = min(margs.block_size, 4096)
        model = Transformer(margs, dtype=jnp.bfloat16)
        params = init_quantized_llama(
            model, Int4WeightOnlyConfig(group_size=32),
            default_linear_filter, jax.random.PRNGKey(0),
        )
        name = args.model

    if args.identical_draft:
        dargs, draft, dparams = margs, model, params
    else:
        dargs = dataclasses.replace(margs)
        dargs.n_layer = max(1, args.draft_layers)
        draft = Transformer(dargs, dtype=jnp.bfloat16)
    if args.identical_draft:
        pass
    elif args.small:
        dparams = quantize_(
            draft.init_params(jax.random.PRNGKey(1)),
            Int4WeightOnlyConfig(group_size=32),
            default_linear_filter,
        )
    else:
        from bench import init_quantized_llama

        dparams = init_quantized_llama(
            draft, Int4WeightOnlyConfig(group_size=32),
            default_linear_filter, jax.random.PRNGKey(1),
        )

    from torchao_tpu.models.llama.generate import generate
    from torchao_tpu.models.llama.speculative import generate_speculative

    prompt = jnp.asarray(
        np.random.RandomState(0).randint(
            0, margs.vocab_size, (1, args.prompt_len)
        ),
        jnp.int32,
    )
    greedy = args.greedy_selfcheck or args.identical_draft
    temperature = 0.0 if greedy else 0.6
    top_k = None if greedy else 200

    # Programs are built ONCE and the timed region is the DECODE loop
    # alone (cache setup + prefill synced outside it). Round-2's numbers
    # re-created the jitted programs inside the timed region, so BOTH
    # arms measured Python re-trace time (~8 tok/s) instead of device
    # decode (PERF.md round-2 spec note) — the wall-clock ratio below is
    # the honest machinery cost.
    from torchao_tpu.models.llama.generate import (
        make_decode_n_tokens,
        make_prefill,
    )
    from torchao_tpu.models.llama.speculative import (
        make_speculative_decode,
    )

    key = jax.random.PRNGKey(0)
    prefill = make_prefill(model)
    dprefill = prefill if args.identical_draft else make_prefill(draft)
    decode_n = make_decode_n_tokens(model, args.new_tokens - 1)
    spec = make_speculative_decode(
        model, draft, args.new_tokens - 1, args.spec_k
    )
    max_seq = args.prompt_len + args.new_tokens + args.spec_k + 1

    def run_spec():
        cache = model.setup_caches(1, max_seq)
        dcache = draft.setup_caches(1, max_seq)
        first, cache = prefill(
            params, prompt, cache, key, temperature, top_k
        )
        _, dcache = dprefill(
            dparams, prompt, dcache, key, temperature, top_k
        )
        int(first[0])
        t0 = time.perf_counter()
        rest, cache, dcache, st = spec(
            params, dparams, prompt[:, -1], first, cache, dcache,
            args.prompt_len, key, temperature, top_k,
        )
        int(rest[0, -1])
        dt = time.perf_counter() - t0
        out = jnp.concatenate([prompt, first[:, None], rest], axis=1)
        rounds, drafted, accepted = (int(s) for s in st)
        return dt, out, {
            "rounds": rounds,
            "drafted": drafted,
            "accepted": accepted,
            "acceptance_rate": accepted / max(drafted, 1),
        }

    def run_vanilla():
        cache = model.setup_caches(1, max_seq)
        first, cache = prefill(
            params, prompt, cache, key, temperature, top_k
        )
        int(first[0])
        t0 = time.perf_counter()
        rest, cache = decode_n(
            params, first, cache, args.prompt_len, key, temperature,
            top_k,
        )
        int(rest[0, -1])
        dt = time.perf_counter() - t0
        out = jnp.concatenate([prompt, first[:, None], rest], axis=1)
        return dt, out

    run_spec()       # compile
    run_vanilla()    # compile
    t_spec, out_s, stats = min(
        (run_spec() for _ in range(2)), key=lambda r: r[0]
    )
    t_van, out_v = min(
        (run_vanilla() for _ in range(2)), key=lambda r: r[0]
    )

    if args.greedy_selfcheck:
        match = bool(
            (np.asarray(out_s) == np.asarray(out_v)).all()
        )
    else:
        match = None

    print(json.dumps({
        "metric": "speculative_decode_tok_s",
        "model": name,
        "identical_draft": args.identical_draft,
        "draft_layers": dargs.n_layer,
        "spec_k": args.spec_k,
        "new_tokens": args.new_tokens,
        "value": round(args.new_tokens / t_spec, 2),
        "vanilla_tok_s": round(args.new_tokens / t_van, 2),
        "speedup": round(t_van / t_spec, 3),
        "acceptance_rate": round(stats["acceptance_rate"], 4),
        "rounds": stats["rounds"],
        "greedy_exact_match": match,
        "unit": "tok/s",
    }), flush=True)


if __name__ == "__main__":
    main()
