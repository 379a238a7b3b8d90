"""Blockwise fp8 and AutoRound tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.prototype.autoround import (
    AutoRoundConfig,
    autoround_quantize_weight,
)
from torchao_tpu.prototype.blockwise_fp8 import Float8BlockwiseLinearConfig
from torchao_tpu.quantization.quant_api import quantize_
from torchao_tpu.utils import compute_error


class TestBlockwiseFp8:
    def test_linear(self):
        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(256, 256), jnp.bfloat16)
        x = jnp.asarray(rs.randn(8, 256), jnp.bfloat16)
        qw = quantize_({"w": w}, Float8BlockwiseLinearConfig())["w"]
        assert qw.scale.shape == (2, 2)  # 256/128 blocks each way
        ref = jnp.matmul(x, w.T)
        out = ops.linear(x, qw)
        assert compute_error(ref, out) > 22

    def test_misaligned_skipped(self):
        w = jnp.ones((100, 100), jnp.bfloat16)
        qw = quantize_({"w": w}, Float8BlockwiseLinearConfig())["w"]
        assert isinstance(qw, jnp.ndarray)


class TestBlockwiseFp8Training:
    def test_forward_numerics(self):
        from torchao_tpu.prototype.blockwise_fp8 import (
            blockwise_fp8_linear,
        )

        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(8, 256), jnp.float32)
        w = jnp.asarray(rs.randn(128, 256), jnp.float32)
        out = blockwise_fp8_linear(x, w, 128)
        ref = x @ w.T
        err = compute_error(ref, out)
        assert 20 < err < 60, err  # fp8 noise present but small

    def test_gradients_close_to_hp(self):
        from torchao_tpu.prototype.blockwise_fp8 import (
            blockwise_fp8_linear,
        )

        rs = np.random.RandomState(3)
        # M=128 so the dW path takes the blockwise branch
        x = jnp.asarray(rs.randn(128, 256), jnp.float32)
        w = jnp.asarray(rs.randn(128, 256), jnp.float32)
        tgt = jnp.asarray(rs.randn(128, 128), jnp.float32)

        def loss_q(x, w):
            return jnp.mean((blockwise_fp8_linear(x, w, 128) - tgt) ** 2)

        def loss_hp(x, w):
            return jnp.mean((x @ w.T - tgt) ** 2)

        gxq, gwq = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gxh, gwh = jax.grad(loss_hp, argnums=(0, 1))(x, w)
        assert compute_error(gxh, gxq) > 20
        assert compute_error(gwh, gwq) > 20

    def test_training_loop_converges(self):
        import optax

        from torchao_tpu.prototype.blockwise_fp8 import (
            Float8BlockwiseTrainingWeight,
            convert_to_blockwise_fp8_training,
        )

        rs = np.random.RandomState(4)
        params = {
            "lin": {"weight": jnp.asarray(rs.randn(128, 128) * 0.1,
                                          jnp.float32)}
        }
        prepared = convert_to_blockwise_fp8_training(
            params, lambda p, l: True
        )
        assert isinstance(prepared["lin"]["weight"],
                          Float8BlockwiseTrainingWeight)
        x = jnp.asarray(rs.randn(128, 128), jnp.float32)
        tgt = jnp.asarray(rs.randn(128, 128), jnp.float32)

        def loss(p):
            return jnp.mean((ops.linear(x, p["lin"]["weight"]) - tgt) ** 2)

        opt = optax.adam(1e-2)
        state = opt.init(prepared)
        l0 = float(loss(prepared))
        for _ in range(60):
            upd, state2 = opt.update(jax.grad(loss)(prepared), state)
            prepared = optax.apply_updates(prepared, upd)
            state = state2
        assert float(loss(prepared)) < l0 * 0.5


class TestAutoRound:
    def test_beats_rtn(self):
        rs = np.random.RandomState(1)
        N, K = 32, 64
        w = jnp.asarray(rs.randn(N, K), jnp.float32)
        A = rs.randn(K, K) * 0.3 + np.eye(K)
        x = jnp.asarray(rs.randn(256, K) @ A, jnp.float32)

        cfg = AutoRoundConfig(bits=4, group_size=32, iters=100, lr=0.01)
        q, s, zp = autoround_quantize_weight(w, x, cfg)
        g = 32
        s_e = jnp.repeat(s.astype(jnp.float32), g, axis=-1)
        dq_ar = q.astype(jnp.float32) * s_e

        # plain RTN with identical qparams
        q_rtn = jnp.clip(jnp.round(w / s_e), -8, 7)
        dq_rtn = q_rtn * s_e

        ref = x @ w.T
        err_ar = float(jnp.mean((x @ dq_ar.T - ref) ** 2))
        err_rtn = float(jnp.mean((x @ dq_rtn.T - ref) ** 2))
        assert err_ar < err_rtn * 0.95, (err_ar, err_rtn)
        assert int(jnp.min(q)) >= -8 and int(jnp.max(q)) <= 7
