"""Autoquant on the live TPU: memory-bound shape must pick int4 over
int8 with reproducible in-jit timings (VERDICT r1 #6 done-criterion).

Runs ``autoquant_`` on one 4096x4096 linear at M=1 (decode GEMV —
memory-bound, int4 streams ~47% the bytes of int8) and prints the
per-candidate timings + the choice. Timing methodology = the in-jit
``lax.fori_loop`` + value-fetch loop (``autoquant._bench_linear``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from torchao_tpu.quantization.autoquant import autoquant_
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        Int8WeightOnlyConfig,
    )

    rs = np.random.RandomState(0)
    params = {
        "proj": jnp.asarray(rs.randn(4096, 4096) * 0.02, jnp.bfloat16)
    }
    out, choices = autoquant_(
        params,
        [Int8WeightOnlyConfig(), Int4WeightOnlyConfig(group_size=128)],
        batch_sizes=(1,),
        filter_fn=lambda p, l: True,
        iters=30,
    )
    print("choices:", choices, flush=True)
    assert "Int4WeightOnlyConfig" in choices["proj"], choices
    print("OK: autoquant picked int4 for the memory-bound GEMV")


if __name__ == "__main__":
    main()
