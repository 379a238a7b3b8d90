"""Populate the kernel autotune cache on the live TPU (VERDICT r1 #6).

Times a focused candidate set for the Llama-3-8B decode matmul shapes
with the in-jit ``lax.fori_loop`` + value-fetch methodology
(``kernels/autotune.py::time_amortized`` — the pattern bench.py proved;
per-dispatch timing through the ~1.2 ms tunnel cannot rank sub-ms
candidates). Writes/updates ``kernels/configs/autotune_cache.json``
keyed by (kernel, backend, shape). Each candidate costs a fresh Mosaic
compile (minutes over the remote-compile path), hence the trimmed grid.

Usage: TORCHAO_TPU_AUTOTUNE=1 python scripts/autotune_populate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TORCHAO_TPU_AUTOTUNE", "1")

import numpy as np
import jax
import jax.numpy as jnp


# Llama-3-8B g=32 decode shapes (M, N, K): merged w13, wqkv, wo, w2, head
SHAPES = [
    (1, 28672, 4096),
    (1, 6144, 4096),
    (1, 4096, 4096),
    (1, 4096, 14336),
    (1, 128256, 4096),
]
CANDIDATES = [
    {"bn": 1024, "bkp": 1024, "variant": "batched_int8"},
    {"bn": 2048, "bkp": 1024, "variant": "batched_int8"},
    {"bn": 2048, "bkp": 512, "variant": "batched_int8"},
    {"bn": 2048, "bkp": 2048, "variant": "batched_int8"},
]


def main():
    from torchao_tpu.kernels.autotune import lookup_or_tune, _cache_path
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    g = 32
    rs = np.random.RandomState(0)
    for M, N, K in SHAPES:
        w = jnp.asarray(rs.randn(N, K) * 0.05, jnp.bfloat16)
        qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=g))["w"]
        x = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
        zero = qw.zero_point
        cands = [
            dict(c, bn=min(c["bn"], N)) for c in CANDIDATES
            if (K // 2) % max(c["bkp"], 8 * g) == 0 or True
        ]
        best = lookup_or_tune(
            "int4_dq_matmul",
            (M, N, K, g),
            cands,
            lambda cfg, xi: int4_dq_matmul(
                xi, qw.qdata, qw.scale, zero, qw.qparams_eff,
                group_size=g, qparams_chunk=qw.qparams_eff_chunk,
                xored=qw.nibbles_xored, **cfg,
            ),
            example_x=x,
        )
        print(f"shape M={M} N={N} K={K}: best={best}", flush=True)
    print("cache:", _cache_path())


if __name__ == "__main__":
    main()
