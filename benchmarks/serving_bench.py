"""Continuous-batching serving throughput benchmark.

Measures aggregate decode tok/s of the ServingEngine on Llama
(default: Llama-3-8B int4wo-g32, int8-KV cache) with staggered request
arrivals — the serving-path counterpart of bench.py's single-stream
number. Prints one JSON line per configuration.

Usage:
  python benchmarks/serving_bench.py [--model Llama-3-8B] [--slots 4]
      [--requests 8] [--new-tokens 64] [--chunk 16] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import time

import jax

try:  # persistent compile cache (works over the axon tunnel)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.serving import Request, ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Llama-3-8B")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument(
        "--group-size", type=int, default=32,
        help="int4wo group size (128 widens the grouped-dot contraction "
        "to the MXU-native width — the B>=16 serving relief, PERF.md)",
    )
    ap.add_argument("--small", action="store_true")
    ap.add_argument(
        "--kv-quant", default="int8",
        help="int8|int8_hmajor|int4|none (cache quantization/layout)",
    )
    args = ap.parse_args()

    if args.small:
        margs = ModelArgs(
            block_size=512, vocab_size=512, n_layer=2, n_head=8,
            n_local_heads=8, dim=256, intermediate_size=512,
        )
        model = Transformer(margs, dtype=jnp.bfloat16)
        from torchao_tpu.quantization.quant_api import (
            Int4WeightOnlyConfig,
            quantize_,
        )

        params = quantize_(
            model.init_params(jax.random.PRNGKey(0)),
            Int4WeightOnlyConfig(group_size=args.group_size),
            default_linear_filter,
        )
    else:
        from bench import init_quantized_llama
        from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

        margs = ModelArgs.from_name(args.model)
        margs.block_size = min(margs.block_size, 4096)
        model = Transformer(margs, dtype=jnp.bfloat16)
        params = init_quantized_llama(
            model, Int4WeightOnlyConfig(group_size=args.group_size),
            default_linear_filter, jax.random.PRNGKey(0),
        )

    kv = False if args.kv_quant in ("none", "false", "") else args.kv_quant
    eng = ServingEngine(
        model, params, max_slots=args.slots, max_seq_len=args.max_seq,
        kv_cache_quantization=kv,
    )
    rs = np.random.RandomState(0)
    reqs = [
        Request(
            prompt=rs.randint(0, margs.vocab_size,
                              args.prompt_len).astype(np.int32),
            max_new_tokens=args.new_tokens,
        )
        for _ in range(args.requests)
    ]
    # warm the programs (compile) with one request
    eng.add_request(Request(
        prompt=reqs[0].prompt.copy(), max_new_tokens=4
    ))
    eng.run_to_completion(chunk=args.chunk)
    eng.completed.clear()

    # instrumented run: per-request TTFT + TPOT (serving-engine
    # reporting norms — VERDICT r3 #6) and admission-pass overhead as a
    # separate line. All requests are submitted at t0, so TTFT includes
    # queueing for requests beyond the slot count (the honest
    # under-load number).
    admit_s = [0.0]
    orig_admit = eng._admit

    def timed_admit():
        a0 = time.perf_counter()
        out = orig_admit()
        admit_s[0] += time.perf_counter() - a0
        return out

    eng._admit = timed_admit

    t0 = time.perf_counter()
    for r in reqs:
        eng.add_request(r)
    first_t, counts = {}, {}
    done_t = {}
    steps = 0
    while eng.queue or eng.active:
        out = (
            eng.step_n(args.chunk) if args.chunk > 1 else eng.step()
        )
        now = time.perf_counter()
        steps += 1
        for rid, toks in out.items():
            n = len(toks) if isinstance(toks, list) else 1
            if n and rid not in first_t:
                first_t[rid] = now
            counts[rid] = counts.get(rid, 0) + n
        for r in eng.completed:
            done_t.setdefault(r.request_id, now)
        if steps > 100000:
            break
    dt = time.perf_counter() - t0
    total = sum(len(r.output) for r in eng.completed)

    def pct(vals, p):
        if not vals:
            return None
        v = sorted(vals)
        return round(v[min(len(v) - 1, int(p * len(v)))] * 1e3, 1)

    ttfts = [first_t[rid] - t0 for rid in first_t]
    tpots = [
        (done_t[rid] - first_t[rid]) / max(counts[rid] - 1, 1)
        for rid in done_t if rid in first_t
    ]
    print(json.dumps({
        "metric": "serving_aggregate_tok_s",
        "model": "tiny" if args.small else args.model,
        "slots": args.slots,
        "requests": args.requests,
        "new_tokens": args.new_tokens,
        "chunk": args.chunk,
        "kv_quant": args.kv_quant,
        "group_size": args.group_size,
        "total_tokens": total,
        "wall_s": round(dt, 2),
        "value": round(total / dt, 2),
        "unit": "tok/s",
        "ttft_ms_p50": pct(ttfts, 0.50),
        "ttft_ms_p99": pct(ttfts, 0.99),
        "tpot_ms_p50": pct(tpots, 0.50),
        "tpot_ms_p99": pct(tpots, 0.99),
        "admission_s": round(admit_s[0], 3),
        "admission_pct": round(100 * admit_s[0] / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
