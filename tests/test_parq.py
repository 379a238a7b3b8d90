"""ParQ proximal-QAT tests: annealed training lands weights ON the grid
with task quality close to unconstrained training."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.prototype.parq import (
    ParQConfig,
    parq_prox_step,
    parq_regularizer,
)
from torchao_tpu.prototype.parq.api import (
    _grid_quant_dequant,
    lambda_schedule,
)


def test_prox_step_limits():
    w = jnp.asarray(np.random.RandomState(0).randn(16, 32), jnp.float32)
    # λ→0: identity; λ→∞: exactly on grid
    near_id = parq_prox_step(w, 1e-6, bits=4, group_size=32)
    np.testing.assert_allclose(np.asarray(near_id), np.asarray(w), atol=1e-4)
    on_grid = parq_prox_step(w, 1e9, bits=4, group_size=32)
    dq = _grid_quant_dequant(on_grid, 4, 32)
    np.testing.assert_allclose(
        np.asarray(on_grid), np.asarray(dq), atol=1e-4
    )


def test_parq_training_lands_on_grid():
    rs = np.random.RandomState(0)
    Wtrue = jnp.asarray(rs.randn(16, 32), jnp.float32)
    X = jnp.asarray(rs.randn(256, 32), jnp.float32)
    Y = X @ Wtrue.T
    cfg = ParQConfig(bits=4, group_size=32)

    w = jnp.asarray(rs.randn(16, 32) * 0.1, jnp.float32)
    loss = lambda w: jnp.mean((X @ w.T - Y) ** 2)
    grad = jax.jit(jax.grad(loss))
    steps = 600
    for i in range(steps):
        w = w - 0.05 * grad(w)
        lam = lambda_schedule(i, steps, cfg) * 0.05  # scaled by lr
        w = parq_prox_step(w, lam, cfg.bits, cfg.group_size)

    # final weights are (numerically) on the int4 grid
    dq = _grid_quant_dequant(w, 4, 32)
    grid_err = float(jnp.max(jnp.abs(w - dq)))
    assert grid_err < 2e-2, grid_err
    # and the quantized solution still solves the task reasonably
    assert float(loss(dq)) < float(loss(jnp.zeros_like(w))) * 0.35


def test_regularizer_gradient():
    w = jnp.asarray(np.random.RandomState(1).randn(8, 32), jnp.float32)
    g = jax.grad(lambda w: parq_regularizer(w, 4, 32))(w)
    dq = _grid_quant_dequant(w, 4, 32)
    np.testing.assert_allclose(
        np.asarray(g), 2 * np.asarray(w - dq), atol=1e-5
    )
