"""int4 decode-kernel DMA-merge probe (ROADMAP round-3 perf item 1).

Mirrors the REAL decode path: stacked [L, Kp, N] weights closed over a
``lax.scan`` over layer INDICES, scalar-prefetched ``layer_idx`` block
index maps (zero slice copies), precomputed kernel-form qparams leaf.

Variants:
  eff4    — current production path: ONE family-major qparams_eff leaf
            read as FOUR index-mapped block streams (4 DMA/step).
  m1      — candidate: qparams re-laid out block-major
            [L, nbk, 4*bg, N] so ONE block fetch per grid step carries
            all four families (2 DMA streams/step total: wp + qp).
  m1bkp2048 / m1bn4096 — m1 with bigger K / N blocks.

Usage: python scripts/int4_probe2.py --variants eff4,m1
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.kernels.int4_matmul import int4_dq_matmul
from torchao_tpu.utils import cdiv

L, M, G = 16, 1, 32
REPS = 8
# ffn-dominant decode shapes (Llama-3-8B): w1/w3 then w2
SHAPES = [(4096, 14336), (14336, 4096)]


def _kernel_m1(
    l_ref, x3_ref, wp_ref, qp_ref, out_ref, acc_ref,
    *, n_k_blocks: int, n_chunks: int,
):
    """Merged-qparams batched-int8 kernel: identical math to
    _kernel_bint8 but all four qparam families arrive in ONE
    [1, 4*bg, bn] block (block-major layout), sliced at static offsets
    in VMEM. Body processes the K block in ``n_chunks`` sub-chunks so
    f32 partial size stays bounded for large bkp."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, bkp, bn = wp_ref.shape
    two_ng, bm, g = x3_ref.shape
    nG = two_ng // 2
    bg = bkp // g
    cg = bg // n_chunks          # groups per chunk
    ck = cg * g                  # packed rows per chunk

    for c in range(n_chunks):
        wc = wp_ref[0, pl.ds(c * ck, ck)]
        lo3 = (wc & jnp.uint8(0xF)).astype(jnp.int8).reshape(cg, g, bn)
        b3 = (wc ^ jnp.uint8(0x80)).astype(jnp.int8).reshape(cg, g, bn)

        base = k * bg + c * cg
        xlo = x3_ref[pl.ds(base, cg)]
        xhi = x3_ref[pl.ds(nG + base, cg)]
        xcat = jnp.concatenate([xlo, xhi], axis=1)       # [cg, 2bm, g]

        plo = jax.lax.dot_general(
            xcat, lo3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        pb = jax.lax.dot_general(
            xhi, b3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        qoff = c * 4 * cg
        slo = qp_ref[0, pl.ds(qoff, cg)]
        shi16 = qp_ref[0, pl.ds(qoff + cg, cg)]
        z2lo = qp_ref[0, pl.ds(qoff + 2 * cg, cg)]
        z2hi = qp_ref[0, pl.ds(qoff + 3 * cg, cg)]
        contrib = (
            plo[:, :bm, :] * slo.astype(jnp.float32)[:, None, :]
            + (pb - plo[:, bm:, :])
            * shi16.astype(jnp.float32)[:, None, :]
        )
        acc_ref[:] += jnp.sum(contrib, axis=0)
        rs_lo = jnp.sum(xlo, axis=2)
        rs_hi = jnp.sum(xhi, axis=2)
        acc_ref[:] += jax.lax.dot_general(
            rs_lo, z2lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            rs_hi, z2hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bn", "bkp", "n_chunks"),
)
def m1_matmul(x, wp, qpm, *, group_size, bn, bkp, n_chunks, layer_idx):
    M, K = x.shape
    _, Kp, N = wp.shape
    g = group_size
    nG = Kp // g
    bg = bkp // g
    nbk = Kp // bkp

    x3 = x.reshape(M, 2 * nG, g).transpose(1, 0, 2)
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))
    grid = (cdiv(M, M), cdiv(N, bn), nbk)
    kernel = functools.partial(
        _kernel_m1, n_k_blocks=nbk, n_chunks=n_chunks
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * nG, M, g), lambda i, j, k, l: (0, 0, 0)),
            pl.BlockSpec((1, bkp, bn), lambda i, j, k, l: (l[0], k, j)),
            pl.BlockSpec(
                (1, 4 * bg, bn), lambda i, j, k, l: (l[0], k, j)
            ),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * M * N * K,
            bytes_accessed=Kp * N + 4 * nG * N * 2 + M * K * 4,
            transcendentals=0,
        ),
    )(lvec, x3, wp, qpm)


def to_block_major(qeff, bg):
    """[L, 4*nG, N] family-major → [L, nbk*4*bg, N] block-major."""
    Ld, fourng, N = qeff.shape
    nG = fourng // 4
    nbk = nG // bg
    q = qeff.reshape(Ld, 4, nbk, bg, N)
    q = q.transpose(0, 2, 1, 3, 4)          # [L, nbk, 4, bg, N]
    return jnp.asarray(q.reshape(Ld, nbk * 4 * bg, N))


def eff_qparams(scale, zero, mid=8.0):
    nG2 = scale.shape[-2]
    nG = nG2 // 2
    s = scale.astype(jnp.float32)
    z = zero.astype(jnp.float32)
    s_lo, s_hi = s[..., :nG, :], s[..., nG:, :]
    z_lo, z_hi = z[..., :nG, :], z[..., nG:, :]
    return jnp.concatenate(
        [s_lo, s_hi / 16.0, z_lo - mid * s_lo,
         z_hi + (8.0 - mid) * s_hi],
        axis=-2,
    ).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="eff4,m1")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    rs = np.random.RandomState(0)
    data = []
    total_bytes = 0
    for K, N in SHAPES:
        Kp = K // 2
        wp = jnp.asarray(rs.randint(0, 256, (L, Kp, N)), jnp.uint8)
        scale = jnp.asarray(
            rs.rand(L, K // G, N) * 0.01 + 0.005, jnp.bfloat16
        )
        zero = jnp.asarray(rs.randn(L, K // G, N) * 0.02, jnp.bfloat16)
        qeff = eff_qparams(scale, zero)
        data.append((K, N, wp, scale, zero, qeff))
        total_bytes += (wp.nbytes + qeff.nbytes) // L
    print(f"bytes/layer-sweep: {total_bytes / 1e6:.1f} MB "
          f"× {L} layers × {REPS} reps", flush=True)

    if args.check:
        # numerics: m1 vs production kernel on CPU interpret is slow on
        # these shapes; check on-device vs eff4 output instead
        K, N, wp, scale, zero, qeff = data[0]
        x = jnp.asarray(rs.randn(1, K) * 0.1, jnp.bfloat16)
        ref = int4_dq_matmul(
            x, wp, scale, zero, qeff, group_size=G,
            variant="batched_int8", layer_idx=jnp.int32(3),
        )
        qpm = to_block_major(qeff, 1024 // G)
        got = m1_matmul(
            x, wp, qpm, group_size=G, bn=2048, bkp=1024,
            n_chunks=1, layer_idx=jnp.int32(3),
        )
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"check max|Δ| vs eff4: {err:.3e}")
        assert err == 0.0, err
        print("exact match ✓")
        return

    cfgs = {
        "eff4": None,
        "m1": dict(bn=2048, bkp=1024, n_chunks=1),
        "m1bn4096": dict(bn=4096, bkp=1024, n_chunks=1),
        "m1bkp2048": dict(bn=2048, bkp=2048, n_chunks=2),
        "m1bkp2048c1": dict(bn=2048, bkp=2048, n_chunks=1),
    }
    results = {}
    for name in args.variants.split(","):
        cfg = cfgs[name]

        def one_layer(x, l, K, N, wp, scale, zero, qeff, qpm):
            if cfg is None:
                o = int4_dq_matmul(
                    x, wp, scale, zero, qeff, group_size=G,
                    variant="batched_int8", layer_idx=l,
                )
            else:
                o = m1_matmul(
                    x, wp, qpm, group_size=G, layer_idx=l, **cfg
                )
            return (o * 1e-3).astype(jnp.bfloat16)

        datap = []
        for K, N, wp, scale, zero, qeff in data:
            qpm = (
                None if cfg is None
                else to_block_major(qeff, cfg["bkp"] // G)
            )
            datap.append((K, N, wp, scale, zero, qeff, qpm))

        @jax.jit
        def prog(x0):
            def rep(r, x):
                def layer(x, l):
                    # chain: [1,4096] → w1 [1,14336] → w2 [1,4096]
                    for tup in datap:
                        x = one_layer(x, l, *tup)
                    return x, ()
                x, _ = jax.lax.scan(layer, x, jnp.arange(L))
                return x
            return jax.lax.fori_loop(0, REPS, rep, x0)

        x0 = jnp.ones((M, 4096), jnp.bfloat16) * 0.01
        t0 = time.time()
        out = prog(x0)
        _ = float(out.ravel()[0])
        print(f"  [{name}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        out = prog(x0 * 2)
        _ = float(out.ravel()[0])
        dt = time.time() - t0
        gbs = REPS * L * total_bytes / dt / 1e9
        results[name] = gbs
        us = dt / (REPS * L) * 1e6
        print(f"  [{name}] {dt*1e3:.1f} ms → {gbs:.1f} GB/s "
              f"({us:.2f} µs/layer)", flush=True)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
