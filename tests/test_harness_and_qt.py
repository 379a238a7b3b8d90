"""Exercise the shared QArrayTestHarness across the main quantized array
types (the reference's copy_tests pattern) + quantized-training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.quantization.quant_api import (
    Float8DynamicActivationFloat8WeightConfig,
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.quantization.granularity import PerRow
from torchao_tpu.testing.utils import QArrayTestHarness


def _mk(config, seed=0, shape=(128, 256)):
    w = jnp.asarray(
        np.random.RandomState(seed).randn(*shape), jnp.bfloat16
    )
    qw = quantize_({"w": w}, config)["w"]
    return w, qw


class TestInt8WoHarness(QArrayTestHarness):
    DEQUANT_SQNR = 30
    LINEAR_SQNR = 30

    def make_weight(self):
        return _mk(Int8WeightOnlyConfig())


class TestInt4WoHarness(QArrayTestHarness):
    DEQUANT_SQNR = 15
    LINEAR_SQNR = 15

    def make_weight(self):
        return _mk(Int4WeightOnlyConfig(group_size=32))


class TestFp8DqHarness(QArrayTestHarness):
    DEQUANT_SQNR = 25
    LINEAR_SQNR = 20
    # eager/jit fuse the fp8 act-quant differently (convert placement);
    # both are valid fp8 roundings, so allow one-ULP-of-fp8 slack
    JIT_RTOL = 8e-2
    JIT_ATOL = 8e-2

    def make_weight(self):
        return _mk(
            Float8DynamicActivationFloat8WeightConfig(granularity=PerRow())
        )


class TestQuantizedTraining:
    def test_int8_qt_trains(self):
        from torchao_tpu.prototype.quantized_training import (
            Int8WeightOnlyQuantizedTrainingConfig,
        )

        rs = np.random.RandomState(0)
        W = jnp.asarray(rs.randn(32, 64), jnp.float32)
        X = jnp.asarray(rs.randn(128, 64), jnp.float32)
        Y = X @ W.T
        params = quantize_(
            {"w": jnp.asarray(rs.randn(32, 64) * 0.05, jnp.float32)},
            Int8WeightOnlyQuantizedTrainingConfig(),
        )

        def loss(p):
            return jnp.mean((ops.linear(X, p["w"]) - Y) ** 2)

        l0 = float(loss(params))
        g = jax.jit(jax.grad(loss))
        for _ in range(200):
            grads = g(params)
            params = jax.tree_util.tree_map(
                lambda w, gg: w - 0.05 * gg, params, grads
            )
        assert float(loss(params)) < l0 * 0.3

    def test_bitnet_ternary(self):
        from torchao_tpu.prototype.quantized_training import (
            BitNetTrainingConfig,
        )

        rs = np.random.RandomState(1)
        params = quantize_(
            {"w": jnp.asarray(rs.randn(32, 64), jnp.float32)},
            BitNetTrainingConfig(),
        )
        wq = params["w"].quantized_forward_weight()
        scale = float(jnp.mean(jnp.abs(params["w"].weight)))
        vals = np.unique(np.round(np.asarray(wq) / scale, 3))
        assert set(vals).issubset({-1.0, 0.0, 1.0})

        # gradients flow (STE)
        X = jnp.asarray(rs.randn(16, 64), jnp.float32)

        def loss(p):
            return jnp.sum(ops.linear(X, p["w"]) ** 2)

        gw = jax.grad(loss)(params)["w"].weight
        assert float(jnp.max(jnp.abs(gw))) > 0
