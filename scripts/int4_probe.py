"""int4 decode-kernel variant A/B probe (ROADMAP perf item 1).

Measures effective weight-streaming bandwidth of int4_dq_matmul
variants in the pipelined scan-over-layers shape that mirrors real
decode (the only probe style that has matched end-to-end numbers on
this platform — PERF.md probe-reliability caveat).

Shape: L stacked [Kp, N] uint8 weight tensors + [2·nG, N] scales,
M=1 GEMV scanned inside one jit, REPS sweeps via fori_loop, synced by
value fetch.

Usage: python scripts/int4_probe.py --variants batched_int8,banded
Each variant is one jit compile (minutes over the remote tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.kernels.int4_matmul import int4_dq_matmul

L, M, K, N, G = 16, 1, 4096, 8192, 32
REPS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="batched_int8,banded")
    ap.add_argument("--bn", type=int, default=None)
    ap.add_argument("--bkp", type=int, default=None)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    Kp = K // 2
    rs = np.random.RandomState(0)
    wp = jnp.asarray(rs.randint(0, 256, (L, Kp, N)), jnp.uint8)
    scale = jnp.asarray(
        rs.rand(L, K // G, N) * 0.01 + 0.005, jnp.bfloat16
    )
    zero = jnp.asarray(rs.randn(L, K // G, N) * 0.02, jnp.bfloat16)
    bytes_per_sweep = L * (wp.nbytes // L + 2 * scale.nbytes // L)
    print(f"weight bytes/sweep: {bytes_per_sweep / 1e9:.3f} GB × {REPS}")

    results = {}
    for name in args.variants.split(","):
        kw = {}
        if args.bn:
            kw["bn"] = args.bn
        if args.bkp:
            kw["bkp"] = args.bkp

        @jax.jit
        def prog(x0, wp, scale, zero):
            def rep(r, x):
                def layer(x, lw):
                    lwp, ls, lz = lw
                    o = int4_dq_matmul(
                        x, lwp, ls, lz, group_size=G,
                        variant=name, **kw,
                    )
                    # keep a data dependency, renormalize magnitude
                    return (o[:, :K] * 1e-3).astype(jnp.bfloat16), ()
                x, _ = jax.lax.scan(layer, x, (wp, scale, zero))
                return x
            return jax.lax.fori_loop(0, REPS, rep, x0)

        x0 = jnp.ones((M, K), jnp.bfloat16) * 0.01
        t0 = time.time()
        out = prog(x0, wp, scale, zero)
        _ = float(out.ravel()[0])
        print(f"  [{name}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        out = prog(x0 * 2, wp, scale, zero)
        _ = float(out.ravel()[0])
        dt = time.time() - t0
        gbs = REPS * bytes_per_sweep / dt / 1e9
        results[name] = gbs
        print(f"  [{name}] {dt*1e3:.1f} ms → {gbs:.1f} GB/s", flush=True)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
