"""Ceiling probe for the int4 decode launch structure (VERDICT r3 #1).

The round-3 headline plateaued at ~128.6 tok/s (603 GB/s effective) while
fp8dq streams 659 GB/s e2e on the same hardware. This probe separates
"platform ceiling for this launch structure" from "int4 kernel
inefficiency": it runs the EXACT per-layer launch sequence of the decode
step (wqkv -> wo -> w13 -> w2 per layer x32, + output head), streaming
the EXACT int4 operand set (uint8 qdata + chunked block-major bf16
qparams, identical BlockSpecs/blocks/grid), in two arms:

  real  - the production _kernel_bint8m (nibble unpack + 2 batched dots
          + scale-on-partials + rowsum zero terms)
  stub  - dequant stubbed to one raw-byte MXU pass (kernels/int4_matmul
          stub=True): same bytes, same launches, no decode work

If stub ~= real, the launch structure IS the ceiling and bench.py should
report %-of-measured-ceiling. If stub >> real, the gap is kernel-side.

Weights are random; the probe chains activations through the matmuls so
every launch has a loop-carried data dependency (no dead-code elision).
Attention/KV/sampling are deliberately absent - this times the weight
stream alone (~86% of the decode step per the round-3 attribution).

Usage: python scripts/ceiling_probe_r4.py [--steps 48] [--reps 3]
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
import numpy as np

from torchao_tpu.kernels.int4_matmul import int4_dq_matmul

G = 32
L = 32
CB = 1024 // G          # canonical chunk (groups) — matches intx default
# decode-shape launch set: (K, N, stacked)
SHAPES = {
    "wqkv": (4096, 6144, True),
    "wo": (4096, 4096, True),
    "w13": (4096, 28672, True),
    "w2": (14336, 4096, True),
    "head": (4096, 128256, False),
}
# e2e-adjudicated blocks (kernels/configs/autotune_cache.json)
BLOCKS = {"bn": 2048, "bkp": 1024}


def make_operands(key):
    ops = {}
    total_bytes = 0
    for name, (K, N, stacked) in SHAPES.items():
        kp, ng = K // 2, K // (2 * G)
        lead = (L,) if stacked else ()
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


def call(x, wp, qp, layer_idx, stub):
    K = wp.shape[-2] * 2
    return int4_dq_matmul(
        x, wp, None, None, qp,
        group_size=G, bm=1, **BLOCKS,
        layer_idx=layer_idx, qparams_chunk=CB, xored=True,
        variant="batched_int8", stub=stub,
    )


def build_step(ops, stub):
    def step(x, _):
        def body(x, l):
            a = call(x, *ops["wqkv"], l, stub)            # [1, 6144]
            b = call(a[:, :4096].astype(jnp.bfloat16), *ops["wo"], l, stub)
            c = call(b.astype(jnp.bfloat16), *ops["w13"], l, stub)
            h = (c[:, :14336] * c[:, 14336:]) * 1e-20
            d = call(h.astype(jnp.bfloat16), *ops["w2"], l, stub)
            return (x + d * 1e-20).astype(jnp.bfloat16), None

        x, _ = jax.lax.scan(body, x, jnp.arange(L))
        logits = call(x, *ops["head"], None, stub)
        # fold the head back in (data dependency), keep x finite
        x = x * (1.0 + logits[:, :1].astype(jnp.bfloat16) * 1e-30)
        return x, None

    return step


def mono_probe(total_gb: float, reps: int = 3):
    """Platform ceiling for ONE long launch: a single pallas_call whose
    grid streams ``total_gb`` of uint8 through [1024, 2048] blocks with
    the stub body (one bf16×s8 dot per block). The spread between this
    and the 161-launch stub arm prices the per-launch fill/drain the
    decode structure pays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BR, BC = 1024, 2048
    nblk = int(total_gb * 1e9) // (BR * BC)
    w = jnp.zeros((nblk * BR, BC), jnp.uint8)
    x = jnp.ones((8, BR), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot(
            x_ref[0:1, :], w_ref[:].astype(jnp.int8),
            preferred_element_type=jnp.float32,
        )

        @pl.when(r == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((8, BR), lambda r: (0, 0)),
            pl.BlockSpec((BR, BC), lambda r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((1, BC), lambda r: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, BC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, BC), jnp.float32)],
    )
    run = jax.jit(lambda x, w: call(x, w))
    float(run(x, w).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, w).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return {
        "blocks": nblk,
        "ms": best * 1e3,
        "GBps": nblk * BR * BC / best / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mono-only", action="store_true")
    args = ap.parse_args()

    if args.mono_only:
        m = mono_probe(4.69)
        print(json.dumps({"mono": m}), flush=True)
        return

    key = jax.random.PRNGKey(0)
    ops, nbytes, key = make_operands(key)
    print(f"operand set: {nbytes/1e9:.3f} GB per step", flush=True)
    x0 = (jax.random.normal(key, (1, 4096)) * 0.1).astype(jnp.bfloat16)

    results = {}
    for arm in ("stub", "real"):
        stub = arm == "stub"

        @jax.jit
        def run(x, ops):
            step = build_step(ops, stub)
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

    frac = results["real"]["GBps"] / results["stub"]["GBps"]
    out = {
        "probe": "int4_launch_structure_ceiling",
        "bytes_per_step_GB": nbytes / 1e9,
        "stub_GBps": round(results["stub"]["GBps"], 1),
        "real_GBps": round(results["real"]["GBps"], 1),
        "real_vs_structure_ceiling": round(frac, 4),
        "stub_ms": round(results["stub"]["ms_per_step"], 3),
        "real_ms": round(results["real"]["ms_per_step"], 3),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/ceiling_probe_r4.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
