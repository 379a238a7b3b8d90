"""Hadamard matrix utilities.

Replaces the reference's ``prototype/spinquant/hadamard_utils.py`` + its
99k-line generated matrix data file: power-of-two sizes use the Sylvester
construction (all that's needed for Llama dims 4096/8192/14336? — 14336 =
7·2048 is handled by the 28-order base matrix in the reference; here
non-pow2 dims fall back to a random orthogonal matrix, which preserves
the rotation-invariance property that matters for quantization).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def hadamard_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized (orthogonal) Hadamard matrix, n a power of two."""
    assert n & (n - 1) == 0, f"{n} not a power of two"
    H = np.array([[1.0]])
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return jnp.asarray(H / math.sqrt(n), dtype)


def random_hadamard_matrix(
    n: int, key=None, dtype=jnp.float32
) -> jnp.ndarray:
    """Hadamard with random sign diagonal (the reference's randomized
    variant); random orthogonal fallback for non-pow2 n."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if n & (n - 1) == 0:
        H = hadamard_matrix(n, dtype)
        signs = jax.random.rademacher(key, (n,), jnp.float32).astype(dtype)
        return H * signs[None, :]
    # non-pow2: random orthogonal via QR
    A = jax.random.normal(key, (n, n), jnp.float32)
    Q, _ = jnp.linalg.qr(A)
    return Q.astype(dtype)
