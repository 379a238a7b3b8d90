"""Long-context attention ablation probe (ROADMAP perf item 3).

Attributes the ~50 GB/s cache-streaming cap at S=8k (PERF.md
"Long-context decode") to a kernel stage by measuring an ablation
ladder — each rung removes one more stage from the decode kernel:

    none      full kernel (baseline, ~50 GB/s measured end-to-end)
    noexp     exp → identity (isolates the transcendental cost)
    nosoftmax no max/exp/alpha/l chain at all
    nomaskexp also no causal iota/where mask
    dotsonly  just q·K and scores·V MXU dots + accumulate
    xla_sum   pure-XLA jnp.sum over the same cache arrays (platform max)

Shape mirrors the probe that matched the end-to-end numbers: 16
stacked layer caches [1, 8, 8192, 128] int8, scanned inside one jit
with a data dependency, synced by value fetch (block_until_ready
returns early on this platform — CLAUDE.md).

Usage: python scripts/attn_probe.py [--variants none,dotsonly,...]
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

from torchao_tpu.kernels.quantized_attention import (
    quantized_kv_decode_attention,
)

L, B, H, S, DH = 16, 1, 8, 8192, 128
REPS = 8


def build_cache(seed):
    rs = np.random.RandomState(seed)
    kq = jnp.asarray(
        rs.randint(-127, 128, (L, B, H, S, DH)), jnp.int8
    )
    ks = jnp.asarray(rs.rand(L, B, H, S, 1) * 0.02, jnp.bfloat16)
    vq = jnp.asarray(
        rs.randint(-127, 128, (L, B, H, S, DH)), jnp.int8
    )
    vs = jnp.asarray(rs.rand(L, B, H, S, 1) * 0.02, jnp.bfloat16)
    return kq, ks, vq, vs


def run_variant(name, cache, pos):
    # NOTE: bytes_per_sweep is the FULL stacked cache (kq.nbytes spans
    # all L layers); one rep sweeps it once — no extra ×L factor.
    # (An earlier version multiplied by L, inflating GB/s 16×; only
    # RELATIVE variant comparisons from those runs are meaningful.)
    kq, ks, vq, vs = cache
    bytes_per_sweep = (
        L * (kq.nbytes + vq.nbytes + ks.nbytes + vs.nbytes) // L
    )

    if name == "xla_sum":
        @jax.jit
        def prog(q0):
            def rep(r, q):
                def layer(carry, layer_kv):
                    lk, lks, lv, lvs = layer_kv
                    s = (
                        jnp.sum(lk.astype(jnp.int32))
                        + jnp.sum(lv.astype(jnp.int32))
                    ).astype(jnp.float32) + jnp.sum(
                        lks.astype(jnp.float32)
                    ) + jnp.sum(lvs.astype(jnp.float32))
                    return carry + s, ()
                tot, _ = jax.lax.scan(
                    layer, jnp.float32(0), (kq, ks, vq, vs)
                )
                return q + tot * 1e-20
            return jax.lax.fori_loop(0, REPS, rep, q0)

        t0 = time.time()
        out = prog(jnp.float32(0.0))
        _ = float(out)
        dt = time.time() - t0
        # warm second run
        t0 = time.time()
        _ = float(prog(jnp.float32(1.0)))
        dt = time.time() - t0
        gbs = REPS * bytes_per_sweep / dt / 1e9
        return dt, gbs

    G = 4  # Llama-3-8B GQA group

    if name == "bdq":
        from torchao_tpu.kernels.quantized_attention import (
            quantized_kv_decode_attention_bdq,
        )

        # split flat cache views (materialized once, outside timing):
        # K D-major [L, B, H·Dh, S], V S-major [L, B, S, H·Dh],
        # scales [L, B, H, S]
        kqf = jnp.swapaxes(kq, 3, 4).reshape(L, B, H * DH, S)
        ksf = ks[..., 0]
        vqf = jnp.swapaxes(vq, 2, 3).reshape(L, B, S, H * DH)
        vsf = vs[..., 0]
        kqf, ksf, vqf, vsf = map(
            jax.block_until_ready, (kqf, ksf, vqf, vsf)
        )

        @jax.jit
        def prog(q0, kqf, ksf, vqf, vsf):
            def rep(r, q):
                def layer(q, layer_kv):
                    lk, lks, lv, lvs = layer_kv
                    o = quantized_kv_decode_attention_bdq(
                        q, lk, lks, lv, lvs, pos
                    )
                    return o.astype(jnp.bfloat16) * 1e-10, ()
                q, _ = jax.lax.scan(layer, q, (kqf, ksf, vqf, vsf))
                return q
            return jax.lax.fori_loop(0, REPS, rep, q0)

        q0 = jnp.ones((B, H, G, DH), jnp.bfloat16) * 0.01
        t0 = time.time()
        out = prog(q0, kqf, ksf, vqf, vsf)
        _ = float(out.ravel()[0])
        print(f"  [{name}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        out = prog(q0 * 2, kqf, ksf, vqf, vsf)
        _ = float(out.ravel()[0])
        dt = time.time() - t0
        gbs = REPS * bytes_per_sweep / dt / 1e9
        return dt, gbs

    # NOTE: pass cache arrays as jit ARGS — closed-over device arrays
    # are embedded as HLO constants and blow the remote-compile request
    # size limit (HTTP 413, probed).
    @jax.jit
    def prog(q0, kq, ks, vq, vs):
        def rep(r, q):
            def layer(q, layer_kv):
                lk, lks, lv, lvs = layer_kv
                o = quantized_kv_decode_attention(
                    q, lk, lks, lv, lvs, pos,
                    fold_heads=False, ablate=name,
                )
                return o.astype(jnp.bfloat16) * 1e-10, ()
            q, _ = jax.lax.scan(layer, q, (kq, ks, vq, vs))
            return q
        return jax.lax.fori_loop(0, REPS, rep, q0)

    q0 = jnp.ones((B, H, G, DH), jnp.bfloat16) * 0.01
    t0 = time.time()
    out = prog(q0, kq, ks, vq, vs)
    _ = float(out.ravel()[0])
    print(f"  [{name}] compile+first: {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.time()
    out = prog(q0 * 2, kq, ks, vq, vs)
    _ = float(out.ravel()[0])
    dt = time.time() - t0
    gbs = REPS * bytes_per_sweep / dt / 1e9
    return dt, gbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variants",
        default="none,noexp,nosoftmax,nomaskexp,dotsonly,xla_sum",
    )
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    cache = build_cache(0)
    pos = jnp.asarray([S - 2], jnp.int32)
    per_sweep = L * sum(x.nbytes for x in cache) // L
    print(
        f"cache bytes/sweep: {L * (cache[0].nbytes + cache[2].nbytes + cache[1].nbytes + cache[3].nbytes) / L / 1e9:.3f} GB × {REPS} reps"
    )
    results = {}
    for name in args.variants.split(","):
        dt, gbs = run_variant(name, cache, pos)
        results[name] = gbs
        print(f"{name:12s}  {dt*1e3:8.1f} ms   {gbs:7.1f} GB/s",
              flush=True)
    print(results)


if __name__ == "__main__":
    main()
