"""GPTQ-style calibration flow (mirrors the reference's
``tutorials/calibration_flow/gptq_like.py``): accumulate a Hessian from
calibration activations, then solve for error-compensated int4 weights.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
if __import__("os").environ.get("TUTORIAL_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from torchao_tpu.quantization.gptq import (
    accumulate_hessian,
    gptq_quantize_int4,
)
from torchao_tpu.utils import compute_error


def main():
    rs = np.random.RandomState(0)
    N, K = 64, 128
    w = jnp.asarray(rs.randn(N, K), jnp.float32)
    mix = rs.randn(K, K) * 0.4 + np.eye(K)  # correlated activations

    H = None
    for seed in range(4):
        batch = jnp.asarray(
            np.random.RandomState(seed).randn(128, K) @ mix, jnp.float32
        )
        H = accumulate_hessian(H, batch)

    qw = gptq_quantize_int4(w, H, group_size=32)
    x = jnp.asarray(rs.randn(16, K) @ mix, jnp.float32)
    from torchao_tpu import ops

    out = ops.linear(x.astype(jnp.bfloat16), qw)
    ref = x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16).T
    print(f"GPTQ int4 linear SQNR: {compute_error(ref, out):.1f} dB")


if __name__ == "__main__":
    main()
