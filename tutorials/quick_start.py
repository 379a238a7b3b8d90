"""Quick start: quantize a toy 2-layer model to int4 (mirrors the
reference's ``scripts/quick_start.py``).

Run: python tutorials/quick_start.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if __import__("os").environ.get("TUTORIAL_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from torchao_tpu import Int4WeightOnlyConfig, ops, quantize_
from torchao_tpu.utils import benchmark_fn, compute_error, get_model_size_in_bytes


def model_fwd(params, x):
    h = jax.nn.relu(ops.linear(x, params["fc1"]))
    return ops.linear(h, params["fc2"])


def main():
    k1, k2, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "fc1": jax.random.normal(k1, (1024, 1024), jnp.bfloat16) * 0.02,
        "fc2": jax.random.normal(k2, (1024, 1024), jnp.bfloat16) * 0.02,
    }
    x = jax.random.normal(kx, (64, 1024), jnp.bfloat16)

    ref = model_fwd(params, x)
    qparams = quantize_(params, Int4WeightOnlyConfig(group_size=32))
    out = jax.jit(model_fwd)(qparams, x)

    size0 = get_model_size_in_bytes(params)
    size1 = get_model_size_in_bytes(qparams)
    t0 = benchmark_fn(jax.jit(model_fwd), params, x, num_runs=10)
    t1 = benchmark_fn(jax.jit(model_fwd), qparams, x, num_runs=10)
    print(f"SQNR vs bf16:   {compute_error(ref, out):.1f} dB")
    print(f"compression:    {size0 / size1:.2f}x")
    print(f"bf16 latency:   {t0 * 1e3:.3f} ms")
    print(f"int4 latency:   {t1 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
