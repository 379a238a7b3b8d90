"""Shared utilities: SQNR, benchmarking/timing, small math helpers.

Replaces the reference's ``torchao/utils.py`` helpers (``benchmark_model``,
``profiler_runner``, ``compute_error``) with JAX-native equivalents. The
TorchAOBaseTensor machinery itself lives in ``torchao_tpu.qtypes.base``.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compute_error(x, y) -> float:
    """SQNR in dB between a reference ``x`` and a test ``y``.

    Reference ``torchao/quantization/utils.py:53-57``:
    ``20 * log10(||x|| / ||x - y||)``.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    Ps = jnp.linalg.norm(x)
    Pn = jnp.linalg.norm(x - y)
    return float(20 * jnp.log10(Ps / Pn))


def benchmark_fn(
    fn: Callable,
    *args,
    num_runs: int = 20,
    warmup: int = 3,
) -> float:
    """Median wall-clock seconds per call of a (usually jitted) fn.

    JAX analog of the reference's ``benchmark_model``
    (``torchao/utils.py:69-123``). Synchronizes via a value fetch:
    ``block_until_ready`` can return before device completion on remote
    backends (axon tunnel).
    """

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up_to_multiple(x: int, m: int) -> int:
    return cdiv(x, m) * m


def find_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n (reference
    ``torchao/utils.py`` ``find_multiple``)."""
    if n % k == 0:
        return n
    return n + k - (n % k)


def get_model_size_in_bytes(params) -> int:
    """Total bytes of all array leaves in a params pytree (quantized arrays
    flatten to their packed data + scales, so this reports true footprint).

    Analog of reference ``torchao/utils.py`` ``get_model_size_in_bytes``.
    """
    leaves = jax.tree_util.tree_leaves(params)
    return sum(
        l.size * l.dtype.itemsize
        for l in leaves
        if hasattr(l, "dtype") and hasattr(l, "size")
    )
