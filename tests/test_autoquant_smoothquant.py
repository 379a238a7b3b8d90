"""Autoquant and SmoothQuant flow tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.quantization.autoquant import (
    all_autoquant_class_list,
    autoquant_,
)
from torchao_tpu.quantization.smoothquant import (
    SmoothQuantConfig,
    convert_smoothquant_,
    insert_smoothquant_observers_,
)
from torchao_tpu.qtypes import (
    WeightTensorWithLinearActivationScaleMetadata,
)
from torchao_tpu.utils import compute_error


class TestAutoquant:
    def test_picks_and_applies(self):
        params = {
            "w": jnp.asarray(
                np.random.RandomState(0).randn(128, 256), jnp.bfloat16
            )
        }
        out, decisions = autoquant_(
            params, batch_sizes=(1, 8), iters=2
        )
        assert "w" in decisions
        # whatever got picked, linear still works and is accurate-ish
        x = jnp.asarray(
            np.random.RandomState(1).randn(4, 256), jnp.bfloat16
        )
        ref = jnp.matmul(x, params["w"].T)
        got = ops.linear(x, out["w"])
        assert compute_error(ref, got) > 15

    def test_min_sqnr_gate_forces_hp(self):
        params = {
            "w": jnp.asarray(
                np.random.RandomState(0).randn(128, 256), jnp.bfloat16
            )
        }
        out, decisions = autoquant_(
            params, batch_sizes=(1,), min_sqnr=200.0, iters=1
        )
        # impossible SQNR bar → falls back to hp float
        assert decisions["w"] == "none"
        assert isinstance(out["w"], jnp.ndarray)


class TestSmoothQuant:
    def test_flow_reduces_outlier_error(self):
        rs = np.random.RandomState(0)
        K, N = 256, 128
        w = jnp.asarray(rs.randn(N, K), jnp.float32)
        # activations with strong per-channel outliers (smoothquant's case)
        chan_scale = np.ones(K); chan_scale[:8] = 50.0
        xs = [
            jnp.asarray(rs.randn(16, K) * chan_scale, jnp.float32)
            for _ in range(4)
        ]

        observed, stats = insert_smoothquant_observers_({"w": w})
        for x in xs:
            ops.linear(x, observed["w"])  # eager calibration
        assert stats["w"].count == 4

        smoothed = convert_smoothquant_(
            observed, SmoothQuantConfig(alpha=0.5)
        )
        assert isinstance(
            smoothed["w"], WeightTensorWithLinearActivationScaleMetadata
        )

        # plain int8dq on the same data for comparison
        from torchao_tpu.quantization.quant_api import (
            Int8DynamicActivationInt8WeightConfig,
            quantize_,
        )

        plain = quantize_({"w": w}, Int8DynamicActivationInt8WeightConfig())

        xt = jnp.asarray(rs.randn(16, K) * chan_scale, jnp.float32)
        ref = jnp.matmul(xt, w.T)
        err_smooth = compute_error(ref, ops.linear(xt, smoothed["w"]))
        err_plain = compute_error(ref, ops.linear(xt, plain["w"]))
        assert err_smooth > err_plain + 3, (
            f"smoothquant {err_smooth} dB should beat plain {err_plain} dB "
            "on outlier-heavy activations"
        )
