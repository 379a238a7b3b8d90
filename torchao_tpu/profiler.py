"""Profiling helpers.

Analog of the reference's ``profiler_runner`` / ``benchmark_model``
(``torchao/utils.py:69-125``) and the microbenchmark profiler: wraps
``jax.profiler`` trace capture and adds roofline estimates per op shape.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def profiler_runner(path: str = "/tmp/torchao_tpu_trace"):
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard) —
    the chrome-trace analog of the reference's ``generate.py --profile``."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def roofline_report(
    m: int, n: int, k: int, *,
    weight_bits: float = 16, act_bits: float = 16,
    hbm_gbps: float = 819.0, mxu_tflops: float = 197.0,
) -> dict:
    """Analytic roofline for a [M,K]x[K,N] linear at given precisions."""
    flops = 2 * m * n * k
    bytes_ = (n * k * weight_bits + m * k * act_bits + m * n * 16) / 8
    t_compute = flops / (mxu_tflops * 1e12)
    t_memory = bytes_ / (hbm_gbps * 1e9)
    bound = "memory" if t_memory > t_compute else "compute"
    return {
        "flops": flops,
        "bytes": int(bytes_),
        "t_compute_us": t_compute * 1e6,
        "t_memory_us": t_memory * 1e6,
        "bound": bound,
        "arithmetic_intensity": flops / bytes_,
    }
