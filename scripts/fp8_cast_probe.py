"""Mosaic fp8 cast/dot legality probe (on hw).

The stacked fp8 decode kernel (VERDICT round-1 item 2) needs one of:

  A. e4m3 -> bf16 astype inside a Pallas kernel
  B. e4m3 -> f32 astype
  C. bf16-lhs x e4m3-rhs dot_general directly
  D. e5m2 -> bf16 astype (spot check)

Each case runs one small Pallas kernel and compares against the XLA
oracle (exact conversions, so require bit-exact match).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, kernel, args, oracle, out_shape, out_dtype):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        )(*args)
        out = np.asarray(out)
        ok = np.allclose(out, np.asarray(oracle), rtol=0, atol=0)
        maxerr = float(np.max(np.abs(out.astype(np.float32) -
                                     np.asarray(oracle, np.float32))))
        print(f"{name}: COMPILES exact={ok} maxerr={maxerr}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILS ({msg})")


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(256, 512), jnp.float8_e4m3fn)
    x5 = jnp.asarray(rs.randn(256, 512), jnp.float8_e5m2)
    a = jnp.asarray(rs.randn(128, 512), jnp.bfloat16)

    def k_cast_bf16(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.bfloat16)

    def k_cast_f32(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32)

    def k_dot(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def k_cast5(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.bfloat16)

    probe("A e4m3->bf16 cast", k_cast_bf16, (x,),
          x.astype(jnp.bfloat16), (256, 512), jnp.bfloat16)
    probe("B e4m3->f32 cast", k_cast_f32, (x,),
          x.astype(jnp.float32), (256, 512), jnp.float32)
    probe("C bf16 x e4m3 dot", k_dot, (a, x),
          jax.lax.dot_general(
              a.astype(jnp.float32), x.astype(jnp.float32),
              (((1,), (1,)), ((), ())),
          ), (128, 256), jnp.float32)
    probe("D e5m2->bf16 cast", k_cast5, (x5,),
          x5.astype(jnp.bfloat16), (256, 512), jnp.bfloat16)


if __name__ == "__main__":
    main()
