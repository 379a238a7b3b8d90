"""Manual-DMA cross-launch overlap probe (VERDICT r3 #1, round-4).

The ceiling probe measured the decode launch structure at 644 GB/s vs
~754 GB/s for one long launch — per-launch fill/drain. The round-2/3
megakernels (standard grid pipeline) measured parity because the phase
transition re-pays the fill. The ONE untried lever: a kernel that owns
its DMA schedule (weights in HBM memory space, run_scoped double
buffers, make_async_copy), so the NEXT matmul's first block is in
flight during the previous matmul's last compute — cross-launch overlap
Mosaic's auto-pipeliner cannot express.

Probe: two back-to-back GEMV matmuls with wo/wqkv-like short-launch
shapes (the fill/drain-dominated class), int8 weights, bf16 x:

  arm "two_calls": two standard pallas_calls (the int8wo kernel form)
  arm "manual":    ONE pallas_call, weights in HBM, hand-rolled
                   double-buffered DMA over a unified block schedule

Both fori-amortized with a value-fetch sync. If "manual" beats
"two_calls" by ~the fill/drain fraction, the whole-layer manual kernel
is worth building; if parity, the launch-structure ceiling stands as
the platform limit and the headline closes at the measured fraction.
"""

import functools
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
except Exception:
    pass

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4096
N1 = 4096    # wo-like
N2 = 6144    # wqkv-like
BN = 512     # rows per DMA block (2 MB i8 at K=4096)
LOOP = 48


def _std_kernel(x_ref, w_ref, out_ref, acc_ref):
    j = pl.program_id(0)
    acc_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def std_call(x, w):
    N = w.shape[0]
    return pl.pallas_call(
        _std_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0)),
            pl.BlockSpec((BN, K), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, BN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, BN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K, bytes_accessed=N * K, transcendentals=0
        ),
    )(x, w)


def _manual_kernel(x_ref, w1_ref, w2_ref, out1_ref, out2_ref):
    n1, n2 = N1 // BN, N2 // BN
    schedule = [(0, b) for b in range(n1)] + [(1, b) for b in range(n2)]

    def body(buf, sem):
        def dma(slot, idx):
            arr, blk = schedule[idx]
            src = w1_ref if arr == 0 else w2_ref
            return pltpu.make_async_copy(
                src.at[pl.ds(blk * BN, BN), :], buf.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()
        x = x_ref[:]
        for i, (arr, blk) in enumerate(schedule):
            if i + 1 < len(schedule):
                dma((i + 1) % 2, i + 1).start()
            dma(i % 2, i).wait()
            p = jax.lax.dot_general(
                x, buf[i % 2], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dst = out1_ref if arr == 0 else out2_ref
            dst[:, pl.ds(blk * BN, BN)] = p.astype(dst.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, BN, K), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
    )


def manual_call(x, w1, w2):
    return pl.pallas_call(
        _manual_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N1), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, N2), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (N1 + N2) * K,
            bytes_accessed=(N1 + N2) * K,
            transcendentals=0,
        ),
    )(x, w1, w2)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.randint(k1, (N1, K), -128, 128, jnp.int32).astype(
        jnp.int8
    )
    w2 = jax.random.randint(k2, (N2, K), -128, 128, jnp.int32).astype(
        jnp.int8
    )
    x0 = (jax.random.normal(k3, (1, K)) * 0.1).astype(jnp.bfloat16)
    nbytes = (N1 + N2) * K

    # correctness first (hw)
    o1, o2 = manual_call(x0, w1, w2)
    r1 = std_call(x0, w1)
    r2 = std_call(x0, w2)
    import numpy as np

    e1 = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - r1.astype(jnp.float32))))
    e2 = float(jnp.max(jnp.abs(o2.astype(jnp.float32) - r2.astype(jnp.float32))))
    d1 = float(jnp.max(jnp.abs(r1.astype(jnp.float32)))) + 1e-9
    print(json.dumps({"rel_err": [e1 / d1, e2 / d1]}), flush=True)

    def bench(fn, label):
        @jax.jit
        def run(x):
            def body(i, x):
                outs = fn(x)
                t = outs[0] if isinstance(outs, (tuple, list)) else outs
                return x * (1.0 + t[0, :1] * 1e-30).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, LOOP, body, x)

        float(run(x0).ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / LOOP)
        print(json.dumps({
            "arm": label, "us": round(best * 1e6, 2),
            "GBps": round(nbytes / best / 1e9, 1),
        }), flush=True)
        return best

    t_two = bench(
        lambda x: (std_call(x, w1), std_call(x, w2)), "two_calls"
    )
    t_man = bench(lambda x: manual_call(x, w1, w2), "manual_dma")
    print(json.dumps({
        "speedup_manual_vs_two_calls": round(t_two / t_man, 4)
    }), flush=True)


if __name__ == "__main__":
    main()
