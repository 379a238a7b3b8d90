"""3B-geometry launch-structure ceiling probe (VERDICT r4 next #1).

Same falsification as scripts/ceiling_probe_r4.py, ported to the
Llama-3.2-3B decode geometry (dim 3072, 28 layers, inter 8192, GQA
24/8, vocab 128256): run the EXACT per-layer launch sequence of the
decode weight stream (wqkv -> wo -> w13 -> w2 x28 + head) over the
EXACT int4 operand set, in two arms:

  real - the production batched_int8 kernel (full dequant math)
  stub - dequant stubbed to one raw-byte MXU pass (same bytes, same
         launches, no decode work)

stub ~= real  => the 3B launch structure is the ceiling; 196.8 tok/s
                 (346.7 GB/s) is structural, not kernel inefficiency.
stub >> real  => kernel-side headroom exists at 3B shapes; launch-merge
                 candidates must be re-adjudicated at this geometry.

Usage: python scripts/ceiling_probe_3b.py [--steps 48] [--reps 3]
       [--model 3B|8B]
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

from torchao_tpu.kernels.int4_matmul import int4_dq_matmul

G = 32
CB = 1024 // G          # canonical qparams chunk (groups)
BLOCKS = {"bn": 2048, "bkp": 1024}

GEOM = {
    # dim, n_layer, qkv_out, inter, vocab
    "8B": dict(dim=4096, L=32, qkv=6144, inter=14336, vocab=128256),
    "3B": dict(dim=3072, L=28, qkv=5120, inter=8192, vocab=128256),
}


def shapes(g):
    return {
        "wqkv": (g["dim"], g["qkv"], True),
        "wo": (g["dim"], g["dim"], True),
        "w13": (g["dim"], 2 * g["inter"], True),
        "w2": (g["inter"], g["dim"], True),
        "head": (g["dim"], g["vocab"], False),
    }


def make_operands(key, g):
    ops = {}
    total_bytes = 0
    for name, (K, N, stacked) in shapes(g).items():
        kp, ng = K // 2, K // (2 * G)
        lead = (g["L"],) if stacked else ()
        k1, k2, key = jax.random.split(key, 3)
        wp = jax.random.randint(
            k1, lead + (kp, N), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        qp = (jax.random.normal(k2, lead + (4 * ng, N)) * 0.01).astype(
            jnp.bfloat16
        )
        ops[name] = (wp, qp)
        total_bytes += wp.size + qp.size * 2
    return ops, total_bytes, key


def _chunk_for(Kp):
    """Mirror qtypes.intx._tiled_eff_qparams_chunked chunk selection."""
    nG = Kp // G
    cb = 1024 // G
    while cb >= 8 and nG % cb:
        cb //= 2
    return cb if cb >= 8 and nG % cb == 0 else None


def call(x, wp, qp, layer_idx, stub):
    return int4_dq_matmul(
        x, wp, None, None, qp,
        group_size=G, bm=1, **BLOCKS,
        layer_idx=layer_idx, qparams_chunk=_chunk_for(wp.shape[-2]),
        xored=True, variant="batched_int8", stub=stub,
    )


def build_step(ops, g, stub):
    dim, inter, L = g["dim"], g["inter"], g["L"]

    def step(x, _):
        def body(x, l):
            a = call(x, *ops["wqkv"], l, stub)
            b = call(a[:, :dim].astype(jnp.bfloat16), *ops["wo"], l, stub)
            c = call(b.astype(jnp.bfloat16), *ops["w13"], l, stub)
            h = (c[:, :inter] * c[:, inter:]) * 1e-20
            d = call(h.astype(jnp.bfloat16), *ops["w2"], l, stub)
            return (x + d * 1e-20).astype(jnp.bfloat16), None

        x, _ = jax.lax.scan(body, x, jnp.arange(L))
        logits = call(x, *ops["head"], None, stub)
        x = x * (1.0 + logits[:, :1].astype(jnp.bfloat16) * 1e-30)
        return x, None

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="3B", choices=list(GEOM))
    ap.add_argument("--bn", type=int, default=None)
    ap.add_argument("--bkp", type=int, default=None)
    ap.add_argument("--arms", default="stub,real")
    args = ap.parse_args()
    g = GEOM[args.model]
    if args.bn:
        BLOCKS["bn"] = args.bn
    if args.bkp:
        BLOCKS["bkp"] = args.bkp

    key = jax.random.PRNGKey(0)
    ops, nbytes, key = make_operands(key, g)
    print(f"{args.model} operand set: {nbytes/1e9:.3f} GB per step", flush=True)
    x0 = (jax.random.normal(key, (1, g["dim"])) * 0.1).astype(jnp.bfloat16)

    results = {}
    for arm in args.arms.split(","):
        stub = arm == "stub"

        @jax.jit
        def run(x, ops):
            step = build_step(ops, g, stub)
            x, _ = jax.lax.scan(step, x, None, length=args.steps)
            return x

        t0 = time.time()
        float(run(x0, ops).ravel()[0])  # compile + sync
        print(f"{arm}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(x0, ops).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        gbps = nbytes / best / 1e9
        results[arm] = {"ms_per_step": best * 1e3, "GBps": gbps}
        print(json.dumps({arm: results[arm]}), flush=True)

    out = {
        "probe": f"int4_launch_structure_ceiling_{args.model}",
        "bytes_per_step_GB": nbytes / 1e9,
        "blocks": dict(BLOCKS),
    }
    for arm, r in results.items():
        out[f"{arm}_GBps"] = round(r["GBps"], 1)
        out[f"{arm}_ms"] = round(r["ms_per_step"], 3)
    if "stub" in results and "real" in results:
        out["real_vs_structure_ceiling"] = round(
            results["real"]["GBps"] / results["stub"]["GBps"], 4
        )
    print(json.dumps(out), flush=True)
    with open(f"/tmp/ceiling_probe_{args.model}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
