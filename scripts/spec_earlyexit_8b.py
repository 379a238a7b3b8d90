"""Early-exit speculative decoding at 8B layer geometry (VERDICT r4 #8).

The round-4 toy (8x2048) validated the projection formula
``speedup = tokens_per_round / (k*n/L + 1 + 0.05*(k+1))`` as a lower
bound; this measures the acceptance-vs-depth curve AT THE 8B LAYER
WIDTH (dim 4096, 32q/8kv heads, FFN 14336 — the exact per-layer
geometry of Llama-3-8B) with a synthetically trained model.

Depth note: a full 32-layer 8B model cannot be TRAINED on one v5e
chip (params+grads alone exceed HBM), so the curve is measured at the
maximum trainable depth (8 layers, ~1.7B params, bf16 train) with
early exits n ∈ {1, 2, 4} — proportionally the n ∈ {4, 8, 16}-of-32
points. The 32-deep acceptance numbers need a real checkpoint
(weight egress); every harness here is turn-key for that day.

One JSON line per configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception as e:
    print("compile cache not available:", e, flush=True)

import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.generate import (
    make_decode_n_tokens,
    make_prefill,
)
from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.models.llama.speculative import (
    early_exit_draft,
    make_speculative_decode,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.testing.synthetic import markov_corpus, train_tiny_llama

VOCAB = 256
NEW_TOKENS = 255
PROMPT = 128
MAX_SEQ = 1024
L = 8  # max trainable depth at 8B width on one chip


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--exits", default="1,2,4")
    ap.add_argument("--ks", default="3,5")
    args = ap.parse_args()

    toks, _ = markov_corpus(0, VOCAB, 120000)
    train = toks[:110000]

    targs = ModelArgs(
        block_size=MAX_SEQ, vocab_size=VOCAB, n_layer=L, n_head=32,
        n_local_heads=8, dim=4096, intermediate_size=14336,
        rope_base=500000,
    )
    import optax

    model_tr = Transformer(targs, dtype=jnp.bfloat16)
    params = model_tr.init_params(jax.random.PRNGKey(0))
    t0 = time.time()
    params, loss = train_tiny_llama(
        model_tr, params, train, steps=args.steps, seq_len=64, batch=4,
        lr=optax.cosine_decay_schedule(1e-2, args.steps), seed=0,
        optimizer="adafactor",  # AdamW moments OOM at this width
    )
    print(json.dumps({
        "trained": f"{L}x4096 (8B layer geometry, bf16)",
        "steps": args.steps, "loss": round(float(loss), 4),
        "train_s": round(time.time() - t0, 1),
    }), flush=True)

    model = Transformer(targs, dtype=jnp.bfloat16)
    params = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        default_linear_filter,
    )
    jax.block_until_ready(params)

    prompt = jnp.asarray(train[:PROMPT][None, :].copy(), jnp.int32)
    key = jax.random.PRNGKey(0)
    prefill = make_prefill(model)
    decode_n = make_decode_n_tokens(model, NEW_TOKENS)

    def run_vanilla():
        cache = model.setup_caches(1, MAX_SEQ)
        first, cache = prefill(params, prompt, cache, key, 0.0, None)
        int(first[0])
        t0 = time.perf_counter()
        rest, _ = decode_n(params, first, cache, PROMPT, key, 0.0, None)
        int(rest[0, -1])
        return time.perf_counter() - t0

    run_vanilla()
    t_van = min(run_vanilla() for _ in range(3))
    print(json.dumps({
        "config": "vanilla_8Bdims", "tok_s": round(NEW_TOKENS / t_van, 1),
    }), flush=True)

    def run_spec(dmodel, dpar, k, label, n_layers):
        dprefill = make_prefill(dmodel)
        spec = make_speculative_decode(model, dmodel, NEW_TOKENS, k)

        def once():
            cache = model.setup_caches(1, MAX_SEQ + k + 1)
            dcache = dmodel.setup_caches(1, MAX_SEQ + k + 1)
            first, cache2 = prefill(params, prompt, cache, key, 0.0, None)
            _, dcache = dprefill(dpar, prompt, dcache, key, 0.0, None)
            int(first[0])
            t0 = time.perf_counter()
            rest, _c, _d, st = spec(
                params, dpar, prompt[:, -1], first, cache2, dcache,
                PROMPT, key, 0.0, None,
            )
            int(rest[0, -1])
            return time.perf_counter() - t0, st

        try:
            once()
            best, st = None, None
            for _ in range(3):
                dt, s = once()
                if best is None or dt < best:
                    best, st = dt, s
            rounds, drafted, accepted = (int(x) for x in st)
            alpha = accepted / max(drafted, 1)
            tokens_per_round = NEW_TOKENS / max(rounds, 1)
            proj = tokens_per_round / (
                k * n_layers / L + 1 + 0.05 * (k + 1)
            )
            print(json.dumps({
                "config": label, "spec_k": k, "n_of_L": f"{n_layers}/{L}",
                "tok_s": round(NEW_TOKENS / best, 1),
                "speedup_vs_vanilla": round(t_van / best, 3),
                "acceptance": round(alpha, 4),
                "tokens_per_round": round(tokens_per_round, 2),
                "projection_formula_speedup": round(proj, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "config": label, "spec_k": k,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)

    for n in (int(s) for s in args.exits.split(",")):
        emodel, eparams = early_exit_draft(model, params, n)
        for k in (int(s) for s in args.ks.split(",")):
            run_spec(emodel, eparams, k, f"early_exit_8Bdims_n{n}", n)


if __name__ == "__main__":
    main()
