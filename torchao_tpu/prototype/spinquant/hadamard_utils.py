"""Hadamard matrix utilities.

Replaces the reference's ``prototype/spinquant/hadamard_utils.py`` + its
99k-line generated matrix data file. Instead of shipping hardcoded
matrices we *construct* them:

- power-of-two orders: Sylvester doubling;
- orders ``2^k · m`` with base ``m ∈ {12, 20, 28}``: Paley I/II base
  matrices (q = 11, 19 prime ≡ 3 mod 4; q = 13 prime ≡ 1 mod 4) plus
  Sylvester doubling — this covers the Llama FFN dims (14336 = 28·512,
  28672 = 28·1024) the reference's ``had_28`` table served;
- anything else falls back to a *deterministic* random orthogonal
  matrix, which preserves the rotation-invariance property that matters
  for quantization (and, being seeded by size alone, lets the offline
  weight fold and the online activation transform agree).

``apply_hadamard`` is the TPU-first *online* transform (reference: the
CUDA ``fast_hadamard_transform`` kernel): rather than materializing the
``[I, I]`` matrix (822 MB for I=14336) and streaming it from HBM every
step, it exploits ``H_{m·p} = H_m ⊗ H_p`` — reshape the last axis to
``[m, p]`` and contract each factor with a tiny constant matrix. Cost
``I·(m+p)`` flops instead of ``I²``, constants ≤ 0.5 MB, both matmuls
land on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_PALEY_BASES = (12, 20, 28)


def _legendre(a: int, q: int) -> int:
    """Legendre symbol χ(a) for prime q (0 for a ≡ 0)."""
    a %= q
    if a == 0:
        return 0
    return 1 if pow(a, (q - 1) // 2, q) == 1 else -1


def _paley_base(n: int) -> np.ndarray:
    """Unnormalized ±1 Hadamard matrix for n ∈ {12, 20, 28}."""
    if n in (12, 20):
        # Paley I: q = n − 1 prime, q ≡ 3 (mod 4).
        q = n - 1
        # Jacobsthal matrix Q[i,j] = χ(i−j)
        Q = np.array(
            [[_legendre(i - j, q) for j in range(q)] for i in range(q)]
        )
        # H = I + S with S the skew conference matrix (S·Sᵀ = q·I)
        H = np.ones((n, n), dtype=np.int64)
        H[1:, 1:] = Q + np.eye(q, dtype=np.int64)
        H[1:, 0] = -1
    elif n == 28:
        # Paley II: n = 2(q+1), q = 13 prime, q ≡ 1 (mod 4). Build the
        # symmetric conference matrix C (zero diagonal, C·Cᵀ = q·I) and
        # substitute H = C ⊗ A + I ⊗ B.
        q = 13
        Q = np.array(
            [[_legendre(i - j, q) for j in range(q)] for i in range(q)]
        )
        C = np.zeros((q + 1, q + 1), dtype=np.int64)
        C[0, 1:] = 1
        C[1:, 0] = 1
        C[1:, 1:] = Q
        A = np.array([[1, 1], [1, -1]], dtype=np.int64)
        B = np.array([[1, -1], [-1, -1]], dtype=np.int64)
        H = np.kron(C, A) + np.kron(np.eye(q + 1, dtype=np.int64), B)
    else:  # pragma: no cover
        raise ValueError(n)
    assert (H @ H.T == n * np.eye(n, dtype=np.int64)).all(), n
    return H


def hadamard_factors(n: int):
    """(m, p) with n = m·p, p a power of two, m ∈ {1} ∪ _PALEY_BASES;
    None if n has no such factorization."""
    if n & (n - 1) == 0:
        return 1, n
    for m in _PALEY_BASES:
        if n % m == 0:
            p = n // m
            if p & (p - 1) == 0:
                return m, p
    return None


def _sylvester(n: int) -> np.ndarray:
    H = np.array([[1]], dtype=np.int64)
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return H


def hadamard_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized (orthogonal) Hadamard matrix; n = 2^k or 2^k·{12,20,28}."""
    f = hadamard_factors(n)
    assert f is not None, f"no Hadamard construction for order {n}"
    m, p = f
    H = _sylvester(p)
    if m > 1:
        H = np.kron(_paley_base(m), H)
    return jnp.asarray(H / math.sqrt(n), dtype)


def is_hadamard_order(n: int) -> bool:
    return hadamard_factors(n) is not None


def random_hadamard_matrix(
    n: int, key=None, dtype=jnp.float32
) -> jnp.ndarray:
    """Hadamard with random sign diagonal (the reference's randomized
    variant); random orthogonal fallback for non-constructible n."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if is_hadamard_order(n):
        H = hadamard_matrix(n, dtype)
        signs = jax.random.rademacher(key, (n,), jnp.float32).astype(dtype)
        return H * signs[None, :]
    # fallback: random orthogonal via QR
    A = jax.random.normal(key, (n, n), jnp.float32)
    Q, _ = jnp.linalg.qr(A)
    return Q.astype(dtype)


def deterministic_orthogonal(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Orthogonal matrix seeded by n alone — offline fold and online
    apply sides reconstruct the identical matrix independently."""
    A = jax.random.normal(jax.random.PRNGKey(n), (n, n), jnp.float32)
    Q, _ = jnp.linalg.qr(A)
    return Q.astype(dtype)


def apply_hadamard(x: jnp.ndarray) -> jnp.ndarray:
    """y = x · H_I over the last axis, via the Kronecker factorization
    (small constants, MXU matmuls) — the online R4 transform."""
    I = x.shape[-1]
    f = hadamard_factors(I)
    if f is None:
        R = deterministic_orthogonal(I, jnp.float32)
        return jnp.einsum(
            "...i,ij->...j", x.astype(jnp.float32), R
        ).astype(x.dtype)
    m, p = f
    if m == 1:
        # split the pow2 order into two ~sqrt factors
        a = 1 << (int(math.log2(p)) // 2)
        m, p = a, p // a
    Hm = hadamard_matrix(m, jnp.float32) * math.sqrt(m)
    Hp = hadamard_matrix(p, jnp.float32) * math.sqrt(p)
    xr = x.reshape(x.shape[:-1] + (m, p)).astype(jnp.float32)
    # row-major [m, p] view of index i = a·p + b ⇒ H = Hm ⊗ Hp
    y = jnp.einsum("...ab,ac->...cb", xr, Hm)
    y = jnp.einsum("...cb,bd->...cd", y, Hp)
    y = y / math.sqrt(m * p)
    return y.reshape(x.shape).astype(x.dtype)
