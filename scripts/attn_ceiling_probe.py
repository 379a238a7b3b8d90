"""Attention-stream structure-ceiling probe at 8k context (VERDICT r4
next #2).

The headline's falsification (stubbed-compute control at identical
launches/blocks) settled whether 609 GB/s was structural; this does the
same for the 8k-decode ATTENTION stream, which round 4 measured at
~486 GB/s effective — 25% under the weight stream. Two arms over the
EXACT decode launch set (scan over 32 layers, one bdq launch/layer,
stacked split-flat cache, production block size):

  real - the shipped bdq kernel (scores/softmax/band math)
  stub - same blocks + streams, one unpack + two fat dots, no
         attention math (kernels/quantized_attention.py stub=True)

stub ~= real  => ~486 GB/s is the launch/DMA structure's rate for
                 cache-shaped (S-blocked, per-layer) streams; the 8k
                 row stands on a measured roofline fraction.
stub >> real  => kernel-side compute is stealing streaming time.

Usage: python scripts/attn_ceiling_probe.py [--S 8192] [--bs 1024]
       [--kv int4|int8] [--steps 32] [--reps 3]
"""

import argparse
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

from torchao_tpu.kernels.quantized_attention import (
    quantized_kv_decode_attention_bdq,
)

L, B, Hkv, G, Dh = 32, 1, 8, 4, 128  # Llama-3-8B decode geometry
HD = Hkv * Dh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=8192)
    ap.add_argument("--bs", type=int, default=1024)
    ap.add_argument("--kv", default="int4", choices=("int4", "int8"))
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    S = args.S
    int4 = args.kv == "int4"
    hd = HD // (2 if int4 else 1)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k, shp: jax.random.randint(
        k, shp, 0, 256, jnp.int32
    ).astype(jnp.uint8 if int4 else jnp.int8)
    if not int4:
        mk = lambda k, shp: jax.random.randint(
            k, shp, -127, 128, jnp.int32
        ).astype(jnp.int8)
    k_q = mk(ks[0], (L, B, hd, S))
    v_q = mk(ks[1], (L, B, S, hd))
    k_s = (jax.random.uniform(ks[2], (L, B, Hkv, S)) * 0.01).astype(
        jnp.bfloat16
    )
    v_s = (jax.random.uniform(ks[3], (L, B, Hkv, S)) * 0.01).astype(
        jnp.bfloat16
    )
    q0 = (jax.random.normal(ks[4], (B, Hkv, G, Dh)) * 0.1).astype(
        jnp.bfloat16
    )
    nbytes = (
        k_q.size + v_q.size + 2 * k_s.size
    )  # per decode step (all layers)
    print(f"cache stream: {nbytes/1e9:.3f} GB per step", flush=True)
    pos = jnp.asarray(S - 2, jnp.int32)

    results = {}
    for arm in ("stub", "real"):
        stub = arm == "stub"

        @jax.jit
        def run(q, k_q, k_s, v_q, v_s):
            def step(q, _):
                def body(q, l):
                    attn = quantized_kv_decode_attention_bdq(
                        q, k_q, k_s, v_q, v_s, pos,
                        bs=args.bs, layer_idx=l, stub=stub,
                    )
                    # loop-carried dependency, keep finite
                    q = (q + attn.astype(q.dtype) * 1e-20).astype(
                        jnp.bfloat16
                    )
                    return q, None

                q, _ = jax.lax.scan(body, q, jnp.arange(L))
                return q, None

            q, _ = jax.lax.scan(step, q, None, length=args.steps)
            return q

        t0 = time.time()
        float(run(q0, k_q, k_s, v_q, v_s).ravel()[0])
        print(f"{arm}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(q0, k_q, k_s, v_q, v_s).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        results[arm] = {
            "ms_per_step": best * 1e3,
            "GBps": nbytes / best / 1e9,
        }
        print(json.dumps({arm: results[arm]}), flush=True)

    out = {
        "probe": "attn_stream_structure_ceiling",
        "S": S, "bs": args.bs, "kv": args.kv,
        "bytes_per_step_GB": nbytes / 1e9,
        "stub_GBps": round(results["stub"]["GBps"], 1),
        "real_GBps": round(results["real"]["GBps"], 1),
        "real_vs_structure_ceiling": round(
            results["real"]["GBps"] / results["stub"]["GBps"], 4
        ),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/attn_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
