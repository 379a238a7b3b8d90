"""Low-bit optimizer tests: quantized-state Adam tracks fp32 Adam
(mirrors ``test/test_low_bit_optim.py``'s strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from torchao_tpu.optim import Adam4bit, Adam8bit, AdamFp8, quantized_adam


def _problem(seed=0):
    rs = np.random.RandomState(seed)
    W = jnp.asarray(rs.randn(64, 32), jnp.float32)
    X = jnp.asarray(rs.randn(256, 32), jnp.float32)
    Y = X @ W.T
    params = {"w": jnp.asarray(rs.randn(64, 32) * 0.1, jnp.float32)}

    def loss(p):
        return jnp.mean((X @ p["w"].T - Y) ** 2)

    return params, loss


@pytest.mark.parametrize(
    "opt_fn,bar",
    [(Adam8bit, 0.2), (Adam4bit, 0.6), (AdamFp8, 0.2)],
    ids=["8bit", "4bit", "fp8"],
)
def test_tracks_fp32_adam(opt_fn, bar):
    params, loss = _problem()
    opt_q = opt_fn(1e-2)
    opt_ref = optax.adam(1e-2)

    p_q, p_r = params, params
    s_q = opt_q.init(p_q)
    s_r = opt_ref.init(p_r)
    grad = jax.jit(jax.grad(loss))

    for _ in range(150):
        g = grad(p_q)
        d, s_q = opt_q.update(g, s_q, p_q)
        p_q = jax.tree_util.tree_map(lambda p, d: p + d, p_q, d)

        g = grad(p_r)
        d, s_r = opt_ref.update(g, s_r, p_r)
        p_r = optax.apply_updates(p_r, d)

    lq, lr = float(loss(p_q)), float(loss(p_r))
    assert lq < float(loss(params)) * bar, "quantized Adam failed to optimize"
    assert lq < lr * 4 + 1e-3, f"quantized {lq} vs fp32 {lr}"


def test_state_memory_is_quantized():
    params = {"w": jnp.zeros((64, 64), jnp.float32)}
    opt = Adam8bit(1e-3)
    state = opt.init(params)
    assert state.exp_avg_q["w"].dtype == jnp.int8
    # 4096 fp32 moments -> 4096 int8 + 16 fp32 scales
    assert state.exp_avg_q["w"].size == 4096
    assert state.exp_avg_scale["w"].size == 16


def test_small_tensors_stay_fp32():
    params = {"b": jnp.zeros((8,), jnp.float32)}
    opt = Adam8bit(1e-3)
    state = opt.init(params)
    assert state.exp_avg_q["b"].dtype == jnp.float32
    assert state.exp_avg_scale["b"] is None
