"""MX blockwise-e8m0 quantize: XLA-vs-Pallas decision probe (VERDICT
r3 #10 / SURVEY §2.7 optional path).

The reference's ``csrc/cuda/mx_kernels/`` exists because torch eager
cannot fuse the blockwise amax → e8m0 exponent → cast chain. The
question for TPU is whether XLA already fuses our emulated ``to_mx``
(prototype/mx_formats) to memory-bound speed — if yes, the optional
Pallas kernel buys nothing and the non-goal is measured, not assumed.

Method: fori-amortized jitted to_mx over a Llama-8B-sized weight
([4096, 14336] bf16 → mxfp8 e4m3 + e8m0 scales, block 32), value-fetch
synced. Roofline: read 2 B/elem + write ~1.03 B/elem ≈ 3 B/elem.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
except Exception:
    pass

import jax.numpy as jnp

from torchao_tpu.prototype.mx_formats.mx_tensor import to_mx

R, C = 4096, 14336
LOOP = 16


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (R, C), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, carry):
            s, x = carry
            mx = to_mx(x, elem_dtype="fp8_e4m3", block_size=32)
            # loop-carried dependency through the quantized data
            s = s + mx.qdata.astype(jnp.float32)[0, 0]
            x = (x * (1.0 + s * 1e-30).astype(jnp.bfloat16)).astype(
                jnp.bfloat16
            )
            return (s, x)

        s, _ = jax.lax.fori_loop(
            0, LOOP, body, (jnp.zeros((), jnp.float32), x)
        )
        return s

    t0 = time.time()
    float(run(x))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    bytes_moved = R * C * 3  # bf16 read + fp8 write + scales
    out = {
        "probe": "mx_e8m0_quantize_xla",
        "shape": [R, C],
        "ms": round(best * 1e3, 3),
        "GBps": round(bytes_moved / best / 1e9, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
