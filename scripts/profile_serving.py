"""Profile the serving engine's steady-state decode chunk on TPU.

Admits 8 requests, then perfetto-traces a few step_n(16) calls and prints
per-op device-time attribution (same methodology as profile_decode.py).

Usage: python scripts/profile_serving.py [--kv int8|int8_hmajor|none]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/ao_serving_trace")
    args = ap.parse_args()

    from bench import init_quantized_llama
    from torchao_tpu.models.llama.model import (
        ModelArgs, Transformer, default_linear_filter,
    )
    from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig
    from torchao_tpu.serving import Request, ServingEngine

    margs = ModelArgs.from_name("Llama-3-8B")
    margs.block_size = min(margs.block_size, 4096)
    model = Transformer(margs, dtype=jnp.bfloat16)
    params = init_quantized_llama(
        model, Int4WeightOnlyConfig(group_size=32),
        default_linear_filter, jax.random.PRNGKey(0),
    )
    kv = False if args.kv in ("none", "") else args.kv
    eng = ServingEngine(
        model, params, max_slots=args.slots, max_seq_len=256,
        kv_cache_quantization=kv,
    )
    rs = np.random.RandomState(0)
    for _ in range(args.slots):
        eng.add_request(Request(
            prompt=rs.randint(0, margs.vocab_size, 64).astype(np.int32),
            max_new_tokens=180,
        ))
    t0 = time.time()
    eng.step_n(16)  # admit + compile decode_n
    print(f"admit+first chunk: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    eng.step_n(16)
    dt = time.time() - t0
    print(f"steady chunk(16): {dt*1e3:.1f} ms "
          f"({16*args.slots/dt:.1f} tok/s agg)", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
    t0 = time.time()
    eng.step_n(16)
    eng.step_n(16)
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced 2 chunks: {dt*1e3:.1f} ms", flush=True)

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
        recursive=True,
    ), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    proc, thr = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thr[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev = {p for p, n in proc.items() if "TPU" in n or "tpu" in n}
    agg = defaultdict(lambda: [0.0, 0])
    tot = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        if "step" in thr.get((e["pid"], e.get("tid")), "").lower():
            continue
        agg[e.get("name", "?")][0] += e.get("dur", 0) / 1e3
        agg[e.get("name", "?")][1] += 1
        tot += e.get("dur", 0) / 1e3
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\n== device op time (2 chunks; total {tot:.2f} ms) ==")
    for name, (ms, cnt) in rows[:40]:
        print(f"{ms:9.3f} {cnt:5d} {100*ms/max(tot,1e-9):5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
