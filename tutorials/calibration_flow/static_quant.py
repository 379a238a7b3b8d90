"""Static quantization calibration flow (mirrors the reference's
``tutorials/calibration_flow/static_quant.py``): observe activation
statistics on calibration batches, freeze qparams, deploy with a static
activation scale.
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

from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.observer import (
    MinMaxObserverState,
    ObserverConfig,
    minmax_calculate_qparams,
    minmax_update,
)
from torchao_tpu.quantization.quant_primitives import MappingType


def main():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 128), jnp.float32)

    # 1. observe activations over calibration batches
    # per-tensor activation scale (the common static-quant choice)
    cfg = ObserverConfig(
        mapping_type=MappingType.SYMMETRIC,
        target_dtype="int8",
        granularity=None,
    )
    state = MinMaxObserverState()
    for seed in range(8):
        batch = jnp.asarray(
            np.random.RandomState(seed).randn(16, 128), jnp.float32
        )
        state = minmax_update(state, batch, cfg)

    # 2. freeze activation qparams
    act_scale, act_zp = minmax_calculate_qparams(state, cfg)
    print("static act scale shape:", act_scale.shape)

    # 3. deploy: quantize activations with the FROZEN scale (no per-batch
    # amax pass — the latency win of static over dynamic quant)
    x = jnp.asarray(rs.randn(16, 128), jnp.float32)
    x_q = qp.quantize_affine(
        x, (16, 128), act_scale, act_zp.astype(jnp.int32), "int8"
    )
    x_dq = qp.dequantize_affine(x_q, (16, 128), act_scale, act_zp)
    from torchao_tpu.utils import compute_error

    print(f"static act quant SQNR: {compute_error(x, x_dq):.1f} dB")


if __name__ == "__main__":
    main()
