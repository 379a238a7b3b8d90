"""AWQ-style calibration flow (mirrors the reference's
``tutorials/calibration_flow/awq_like.py``): observe per-channel
activation magnitudes eagerly, search equalization scales, deploy.
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

from torchao_tpu import ops
from torchao_tpu.prototype.awq import (
    AWQConfig,
    convert_awq_,
    insert_awq_observers_,
)
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig
from torchao_tpu.utils import compute_error


def main():
    rs = np.random.RandomState(0)
    K, N = 256, 128
    w = jnp.asarray(rs.randn(N, K), jnp.float32)
    chan = np.ones(K)
    chan[:16] = 25.0  # activation outlier channels

    params, stats = insert_awq_observers_({"w": w})
    for seed in range(4):  # eager calibration (no jit)
        x = jnp.asarray(
            np.random.RandomState(seed).randn(8, K) * chan, jnp.float32
        )
        ops.linear(x, params["w"])

    quantized = convert_awq_(
        params, AWQConfig(base_config=Int4WeightOnlyConfig(group_size=64))
    )

    xt = jnp.asarray(rs.randn(16, K) * chan, jnp.float32)
    ref = xt @ w.T
    out = ops.linear(xt, quantized["w"])
    print(f"AWQ int4 linear SQNR: {compute_error(ref, out):.1f} dB")


if __name__ == "__main__":
    main()
