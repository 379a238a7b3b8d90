"""fp8 grouped matmul training tests (moe_training parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.prototype.moe_training import fp8_scaled_grouped_mm
from torchao_tpu.utils import compute_error


@pytest.fixture
def setup():
    rs = np.random.RandomState(0)
    E, N, K = 4, 32, 64
    sizes = jnp.asarray([8, 4, 0, 12], jnp.int32)
    T = int(sizes.sum())
    x = jnp.asarray(rs.randn(T, K), jnp.float32)
    w = jnp.asarray(rs.randn(E, N, K), jnp.float32)
    return x, w, sizes, E, N, K, T


def _dense_ref(x, w, sizes):
    expert = np.repeat(np.arange(w.shape[0]), np.asarray(sizes))
    return jnp.stack([x[i] @ w[expert[i]].T for i in range(x.shape[0])])


def test_forward_close_to_hp(setup):
    x, w, sizes, *_ = setup
    ref = _dense_ref(x, w, sizes)
    out = fp8_scaled_grouped_mm(x, w, sizes)
    assert compute_error(ref, out) > 25


def test_gradients_close_to_hp(setup):
    x, w, sizes, *_ = setup
    ref_fn = lambda x, w: jnp.sum(_dense_ref(x, w, sizes) ** 2)
    fp8_fn = lambda x, w: jnp.sum(fp8_scaled_grouped_mm(x, w, sizes) ** 2)
    rx, rw = jax.grad(ref_fn, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(fp8_fn, argnums=(0, 1))(x, w)
    assert compute_error(rx, gx) > 15
    assert compute_error(rw, gw) > 15


def test_training_converges(setup):
    x, w, sizes, E, N, K, T = setup
    rs = np.random.RandomState(1)
    target = jnp.asarray(rs.randn(T, N), jnp.float32)
    params = jnp.asarray(rs.randn(E, N, K) * 0.1, jnp.float32)

    def loss(p):
        return jnp.mean((fp8_scaled_grouped_mm(x, p, sizes) - target) ** 2)

    l0 = float(loss(params))
    g = jax.jit(jax.grad(loss))
    for _ in range(100):
        params = params - 0.05 * g(params)
    assert float(loss(params)) < l0 * 0.5
