"""Radix-select top-k pivot: bit-exact equality with lax.top_k's pivot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchao_tpu.ops.sampling import exact_topk_pivot, topk_mask


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("k", [1, 7, 200, 1000])
def test_pivot_matches_topk(dtype, k):
    x = jax.random.normal(
        jax.random.PRNGKey(0), (3, 4096), jnp.float32
    ).astype(dtype) * 10
    ref = jax.lax.top_k(x, k)[0][..., -1:]
    got = exact_topk_pivot(x, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_pivot_with_heavy_ties(dtype):
    # quantized-looking logits: many exact duplicates around the pivot
    x = jnp.round(
        jax.random.normal(jax.random.PRNGKey(1), (2, 2048)) * 3
    ).astype(dtype)
    for k in (1, 5, 64, 2048):
        ref = jax.lax.top_k(x, k)[0][..., -1:]
        got = exact_topk_pivot(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pivot_negative_and_inf():
    x = jnp.asarray(
        [[-1.5, -2.0, -jnp.inf, -0.25, -100.0, -2.0, -0.25, -3.0]],
        jnp.float32,
    )
    for k in range(1, 9):
        ref = jax.lax.top_k(x, k)[0][..., -1:]
        got = exact_topk_pivot(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_topk_mask_matches_reference_warp():
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (2, 8192), jnp.float32)
    k = 200
    ref_pivot = jax.lax.top_k(logits, k)[0][..., -1:]
    ref = jnp.where(logits < ref_pivot, -jnp.inf, logits)
    got = topk_mask(logits, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # small vocab takes the lax.top_k path — same semantics
    small = logits[:, :128]
    np.testing.assert_array_equal(
        np.asarray(topk_mask(small, 5)),
        np.asarray(jnp.where(
            small < jax.lax.top_k(small, 5)[0][..., -1:], -jnp.inf, small
        )),
    )


def test_logits_to_probs_unchanged():
    """The generate-path warp must produce identical sampling dists."""
    from torchao_tpu.models.llama.generate import logits_to_probs

    logits = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 8192)) * 5
    ).astype(jnp.bfloat16)
    p = logits_to_probs(logits, 0.6, 200)
    lg = logits / jnp.bfloat16(0.6)
    pivot = jax.lax.top_k(lg, 200)[0][..., -1:]
    ref = jax.nn.softmax(
        jnp.where(lg < pivot, -jnp.inf, lg), axis=-1
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref))
