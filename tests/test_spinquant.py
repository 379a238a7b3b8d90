"""SpinQuant tests: rotation preserves float function; Hadamard props."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import Transformer
from torchao_tpu.prototype.spinquant import (
    apply_spinquant,
    hadamard_matrix,
    random_hadamard_matrix,
)
from torchao_tpu.utils import compute_error


def test_hadamard_orthogonal():
    H = hadamard_matrix(128)
    np.testing.assert_allclose(
        np.asarray(H @ H.T), np.eye(128), atol=1e-5
    )
    R = random_hadamard_matrix(128, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(R @ R.T), np.eye(128), atol=1e-5
    )


def test_spinquant_preserves_float_function():
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (1, 8)), jnp.int32
    )
    ref, _ = model(params, toks)
    rotated = apply_spinquant(params, jax.random.PRNGKey(2))
    out, _ = model(rotated, toks)
    err = compute_error(ref, out)
    assert err > 35, f"rotation changed the float function: {err} dB"


def test_spinquant_spreads_outliers():
    """A weight with a single huge channel should have a much smaller
    max/mean ratio after rotation (the property that helps int4)."""
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    w = params["layers"]["feed_forward"]["w1"]
    w = w.at[:, :, 7].mul(100.0)  # channel outlier
    params["layers"]["feed_forward"]["w1"] = w
    rotated = apply_spinquant(params, jax.random.PRNGKey(3))

    def kurtosis_proxy(x):
        x = np.abs(np.asarray(x, np.float32)).reshape(-1)
        return x.max() / (x.mean() + 1e-9)

    before = kurtosis_proxy(w)
    after = kurtosis_proxy(rotated["layers"]["feed_forward"]["w1"])
    assert after < before / 2, (before, after)
