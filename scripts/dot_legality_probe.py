"""Mosaic mixed-precision dot legality/accuracy probe (on hw).

Already probed (CLAUDE.md): bf16-lhs × s8-rhs is native+exact;
bf16 × u8 compiles but returns WRONG values. This probe checks the
remaining orientations needed by attention-kernel designs:

  A. s8-lhs × bf16-rhs, contraction (1, 0)   (scoresT = K @ Qbdᵀ)
  B. s8-lhs × f32-rhs?  (skip — f32 rhs never needed)
  C. bf16-lhs(dim0-contract) × s8-rhs        (transposed-lhs mixed)

Each case runs in one Pallas kernel on a [256, 512]×[512, 256] shape
and compares against the XLA f32 oracle.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def make_kernel(case):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if case == "s8_lhs":
            o_ref[:] = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif case == "bf16_lhs_dim0":
            o_ref[:] = jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return kernel


def run(case):
    rs = np.random.RandomState(0)
    if case == "s8_lhs":
        a = jnp.asarray(rs.randint(-127, 128, (256, 512)), jnp.int8)
        b = jnp.asarray(rs.randn(512, 256), jnp.bfloat16)
        oracle = jnp.dot(
            a.astype(jnp.float32), b.astype(jnp.float32)
        )
        out_shape = (256, 256)
    elif case == "bf16_lhs_dim0":
        a = jnp.asarray(rs.randn(512, 256), jnp.bfloat16)
        b = jnp.asarray(rs.randint(-127, 128, (512, 256)), jnp.int8)
        oracle = jnp.dot(
            a.astype(jnp.float32).T, b.astype(jnp.float32)
        )
        out_shape = (256, 256)

    try:
        out = pl.pallas_call(
            make_kernel(case),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(a, b)
        err = float(jnp.max(jnp.abs(out - oracle)))
        rel = err / float(jnp.max(jnp.abs(oracle)))
        print(f"{case}: max_abs_err={err:.4g} rel={rel:.4g} "
              f"{'EXACT-ISH' if rel < 1e-2 else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"{case}: FAILED TO COMPILE: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for c in ("s8_lhs", "bf16_lhs_dim0"):
        run(c)
