"""Profile the headline decode step (Llama-3-8B int4wo-g32) and attribute
device time per op.

Captures a jax.profiler trace of N decode steps (one jitted scan — the
bench's exact program) plus prefill, writes a perfetto trace, and prints
an aggregated per-op device-time table so the next optimization target is
measured, not guessed (PERF.md methodology: profiler for attribution +
e2e for numbers).

Usage:  python scripts/profile_decode.py [--steps 16] [--prompt 128]
        [--kv int8_smajor|int4|""]  [--model Llama-3-8B]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--kv", type=str, default="")
    ap.add_argument("--model", type=str, default="Llama-3-8B")
    ap.add_argument("--recipe", type=str, default="int4wo-32")
    ap.add_argument("--trace_dir", type=str, default="/tmp/ao_decode_trace")
    args = ap.parse_args()

    from bench import init_quantized_llama
    from torchao_tpu.models.llama.cli import config_from_recipe
    from torchao_tpu.models.llama.generate import make_decode_n_tokens, make_prefill
    from torchao_tpu.models.llama.model import (
        ModelArgs, Transformer, default_linear_filter,
    )

    margs = ModelArgs.from_name(args.model)
    need = args.prompt + args.steps
    margs.block_size = min(margs.block_size, max(4096, need))
    model = Transformer(margs, dtype=jnp.bfloat16)
    config = config_from_recipe(args.recipe)
    t0 = time.time()
    params = init_quantized_llama(
        model, config, default_linear_filter, jax.random.PRNGKey(0)
    )
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    kv = args.kv or False
    prompt = jnp.zeros((1, args.prompt), jnp.int32)
    prefill = make_prefill(model)
    decode_n = make_decode_n_tokens(model, args.steps)
    key = jax.random.PRNGKey(0)

    def run():
        cache = model.setup_caches(1, args.prompt + args.steps, quantize=kv)
        first, cache = prefill(params, prompt, cache, key, 0.6, 200)
        int(first[0])
        t0 = time.perf_counter()
        rest, cache = decode_n(params, first, cache, args.prompt, key, 0.6, 200)
        int(rest[0, -1])
        return time.perf_counter() - t0

    t_compile = run()  # compile
    t_warm = run()
    print(f"decode {args.steps} steps: {t_warm*1e3:.1f} ms "
          f"({args.steps/t_warm:.1f} tok/s)", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
    t_traced = run()
    jax.profiler.stop_trace()
    print(f"traced run: {t_traced*1e3:.1f} ms", flush=True)

    # ---- parse perfetto trace ----
    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not paths:
        print("no perfetto trace found", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device lanes: pid whose process name mentions TPU/device
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in proc_names.items()
        if "TPU" in name or "tpu" in name or "/device" in name.lower()
    }
    print("processes:", json.dumps(proc_names, indent=0), flush=True)

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():
            continue  # step markers, not ops
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\n== device op time (total {total:.2f} ms across lanes) ==")
    print(f"{'ms':>9} {'cnt':>5} {'%':>5}  name")
    for name, (ms, cnt) in rows[:45]:
        print(f"{ms:9.3f} {cnt:5d} {100*ms/max(total,1e-9):5.1f}  {name[:110]}")

    out = {
        "steps": args.steps, "prompt": args.prompt, "kv": args.kv,
        "decode_ms": t_warm * 1e3,
        "tok_s": args.steps / t_warm,
        "top_ops": [
            {"name": n, "ms": ms, "count": c} for n, (ms, c) in rows[:60]
        ],
    }
    with open("/tmp/decode_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote /tmp/decode_profile.json")


if __name__ == "__main__":
    main()
