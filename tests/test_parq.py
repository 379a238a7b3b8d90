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


class TestQuantizers:
    def test_ternary_optimal_v(self):
        """Lloyd fixed point must beat the naive 0.7-mean heuristic and
        match a dense brute-force v search."""
        from torchao_tpu.prototype.parq import ternary_quantize

        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(4, 256), jnp.float32)
        dq = ternary_quantize(w)
        err_lloyd = float(jnp.mean((w - dq) ** 2))

        wn = np.asarray(w)
        best = np.inf
        for v in np.linspace(0.01, 3.0, 600):
            t = np.where(np.abs(wn) > v / 2, np.sign(wn), 0.0)
            best = min(best, float(np.mean((wn - v * t) ** 2)))
        assert err_lloyd <= best * 1.02, (err_lloyd, best)

        naive_v = 0.7 * np.mean(np.abs(wn), axis=-1, keepdims=True)
        t = np.where(np.abs(wn) > naive_v / 2, np.sign(wn), 0.0)
        err_naive = float(np.mean((wn - naive_v * t) ** 2))
        assert err_lloyd <= err_naive + 1e-6

    def test_lsbq_residual_decreases(self):
        from torchao_tpu.prototype.parq import lsbq_quantize

        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(4, 128), jnp.float32)
        e1 = float(jnp.mean((w - lsbq_quantize(w, 1)) ** 2))
        e2 = float(jnp.mean((w - lsbq_quantize(w, 2)) ** 2))
        e3 = float(jnp.mean((w - lsbq_quantize(w, 3)) ** 2))
        assert e3 < e2 < e1
        # 1-bit LSBQ == mean-|w| binarization (optimal single binary)
        v = np.mean(np.abs(np.asarray(w)), axis=-1, keepdims=True)
        ref = v * np.where(np.asarray(w) >= 0, 1.0, -1.0)
        np.testing.assert_allclose(
            np.asarray(lsbq_quantize(w, 1)), ref, rtol=1e-6
        )


class TestProxAndOptimizer:
    def test_binary_relax_endpoints(self):
        from torchao_tpu.prototype.parq import (
            prox_binary_relax,
            ternary_quantize,
        )

        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(4, 64), jnp.float32)
        dq = ternary_quantize(w)
        before = prox_binary_relax(w, dq, jnp.int32(0), 10, 20)
        np.testing.assert_allclose(np.asarray(before), np.asarray(w))
        after = prox_binary_relax(w, dq, jnp.int32(25), 10, 20)
        np.testing.assert_allclose(np.asarray(after), np.asarray(dq))
        mid = prox_binary_relax(w, dq, jnp.int32(15), 10, 20)
        np.testing.assert_allclose(
            np.asarray(mid), 0.5 * np.asarray(w) + 0.5 * np.asarray(dq),
            rtol=1e-5,
        )

    def test_quant_optimizer_lands_on_grid(self):
        import optax

        from torchao_tpu.prototype.parq import (
            quant_optimizer,
            ternary_quantize,
        )

        rs = np.random.RandomState(3)
        K = 32
        W_true = jnp.asarray(
            0.5 * np.sign(rs.randn(8, K)) * (rs.rand(8, K) > 0.4),
            jnp.float32,
        )
        x = jnp.asarray(rs.randn(256, K), jnp.float32)
        y = x @ W_true.T
        params = {"w": jnp.asarray(rs.randn(8, K) * 0.3, jnp.float32)}

        steps = 300
        opt = quant_optimizer(
            optax.adam(5e-2), quantize_fn=ternary_quantize,
            total_steps=steps,
        )
        state = opt.init(params)

        def loss(p):
            return jnp.mean((x @ p["w"].T - y) ** 2)

        for _ in range(steps):
            g = jax.grad(loss)(params)
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)

        w = params["w"]
        # final weights are (essentially) exactly ternary
        dq = ternary_quantize(w)
        assert float(jnp.max(jnp.abs(w - dq))) < 1e-3
        assert float(loss(params)) < 0.05
