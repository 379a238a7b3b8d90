"""Sampling ops: exact top-k thresholding without a sort.

``jax.lax.top_k`` over a 128k vocab lowers to a full XLA sort — profiled
at ~1.0 ms per decode step on Llama-3-8B (11% of the whole step; the
second-largest op after the weight matmuls). Top-k *sampling* only needs
the k-th largest VALUE (the pivot below which logits are masked to
-inf), not the sorted order, so we compute the pivot with a radix
select: descend the float bit lattice (monotone unsigned-integer view
of the floats), keeping each candidate bit iff at least k elements are
>= the candidate. 16 (bf16/f16) or 32 (f32) sequential reductions over
the vocab replace the sort — bandwidth-trivial and VPU-friendly.

The result is BIT-EXACT the same pivot as
``lax.top_k(x, k)[0][..., -1:]``, so ``topk_mask`` reproduces the
reference's tie semantics (``generate.py:97``: every logit >= pivot
survives, including ties past k) identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _monotone_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Map floats to unsigned ints such that float order == unsigned int
    order: flip all bits of negatives, flip only the sign bit of
    non-negatives. Returned widened to int32 (unsigned range fits) so
    later comparisons avoid sub-32-bit integer ops (Mosaic-legal
    everywhere, and cheap on the VPU)."""
    if x.dtype == jnp.bfloat16 or x.dtype == jnp.float16:
        u = jax.lax.bitcast_convert_type(x, jnp.uint16)
        sign = jnp.uint16(0x8000)
        flipped = jnp.where(
            (u & sign) != 0, ~u, u | sign
        )
        return flipped.astype(jnp.int32)
    assert x.dtype == jnp.float32, x.dtype
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = jnp.uint32(0x80000000)
    flipped = jnp.where((u & sign) != 0, ~u, u | sign)
    # uint32 → int32 would wrap for values >= 2^31; compare in int32
    # after re-centering: subtract 2^31 (monotone shift on uint32)
    return (flipped ^ sign).astype(jnp.int32)


def _bits_to_float(bits: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of ``_monotone_bits`` (per element)."""
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        u = bits.astype(jnp.uint16)
        sign = jnp.uint16(0x8000)
        orig = jnp.where((u & sign) != 0, u & ~sign, ~u)
        return jax.lax.bitcast_convert_type(orig, dtype)
    u = (bits.astype(jnp.int32) ^ jnp.int32(-2147483648)).astype(
        jnp.uint32
    )
    sign = jnp.uint32(0x80000000)
    orig = jnp.where((u & sign) != 0, u & jnp.uint32(0x7FFFFFFF), ~u)
    return jax.lax.bitcast_convert_type(orig, jnp.float32)


def exact_topk_pivot(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th largest value along the last axis, [..., 1]-shaped — bit-exact
    equal to ``lax.top_k(x, k)[0][..., -1:]`` — via radix select (no
    sort)."""
    assert 1 <= k <= x.shape[-1]
    nbits = 16 if x.dtype in (jnp.bfloat16, jnp.float16) else 32
    u = _monotone_bits(x)  # [..., V] int32, order-preserving
    if nbits == 32:
        # u is RECENTERED int32 (unsigned order preserved under signed
        # compare). Build the answer's UNSIGNED bit pattern top-down;
        # recenter each candidate for the comparison.
        sign32 = jnp.int32(-2147483648)

        def body32(i, ans_u):
            bit = 31 - i
            cand_u = ans_u | (jnp.int32(1) << bit)
            cand_rec = cand_u ^ sign32
            cnt = jnp.sum(
                (u >= cand_rec[..., None]).astype(jnp.int32), axis=-1
            )
            return jnp.where(cnt >= k, cand_u, ans_u)

        ans_u = jax.lax.fori_loop(
            0, 32, body32, jnp.zeros(x.shape[:-1], jnp.int32)
        )
        return _bits_to_float(ans_u ^ sign32, x.dtype)[..., None]

    def body16(i, ans):
        bit = nbits - 1 - i
        cand = ans | (jnp.int32(1) << bit)
        cnt = jnp.sum((u >= cand[..., None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt >= k, cand, ans)

    ans = jax.lax.fori_loop(
        0, nbits, body16, jnp.zeros(x.shape[:-1], jnp.int32)
    )
    return _bits_to_float(ans, x.dtype)[..., None]


def topk_mask(
    logits: jnp.ndarray, k: int, min_size_for_select: int = 4096
) -> jnp.ndarray:
    """Mask logits strictly below the k-th largest to -inf (the
    reference's top-k warp, tie-inclusive). Uses radix select for large
    vocabularies, ``lax.top_k`` for small ones (where the sort is
    cheap and select's fixed iteration cost dominates)."""
    k = min(k, logits.shape[-1])
    if logits.shape[-1] >= min_size_for_select and logits.dtype in (
        jnp.bfloat16, jnp.float16, jnp.float32,
    ):
        pivot = exact_topk_pivot(logits, k)
    else:
        pivot = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < pivot, -jnp.inf, logits)
