"""Pallas kernel tests (interpret mode on CPU) vs jnp reference oracles.

Mirrors the reference's kernel test strategy (custom op vs emulated
reference, ``test/test_ops_*.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.kernels.int4_matmul import (
    int4_dq_matmul,
    int4_dq_matmul_reference,
)
from torchao_tpu.qtypes.packing import pack_int4
from torchao_tpu.utils import compute_error


class TestInt4DqMatmul:
    @pytest.mark.parametrize("M", [1, 8, 64])
    @pytest.mark.parametrize("group_size", [32, 128])
    def test_matches_reference(self, M, group_size):
        rs = np.random.RandomState(0)
        N, K = 256, 512
        x = jnp.asarray(rs.randn(M, K), jnp.float32).astype(jnp.bfloat16)
        q = jnp.asarray(rs.randint(0, 16, (N, K)), jnp.uint8)
        wp = pack_int4(q, axis=-1)
        scale = jnp.asarray(
            rs.rand(N, K // group_size) * 0.1 + 0.01, jnp.bfloat16
        )
        zero = jnp.asarray(
            rs.randn(N, K // group_size) * 0.1, jnp.bfloat16
        )

        ref = int4_dq_matmul_reference(
            x, wp, scale, zero, group_size=group_size
        )
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=group_size,
            bn=128, bkp=128, interpret=True,
        )
        assert out.shape == (M, N) and out.dtype == x.dtype
        err = compute_error(ref, out)
        assert err > 35, f"kernel mismatch: SQNR {err}"

    def test_mid_shift(self):
        """Signed int4 stored shifted: mid = 8 + (-8)... kernel mid arg."""
        rs = np.random.RandomState(1)
        N, K, g = 256, 256, 32
        x = jnp.asarray(rs.randn(4, K), jnp.bfloat16)
        q = jnp.asarray(rs.randint(0, 16, (N, K)), jnp.uint8)
        wp = pack_int4(q, axis=-1)
        scale = jnp.ones((N, K // g), jnp.bfloat16) * 0.05
        zero = jnp.zeros((N, K // g), jnp.bfloat16)
        ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g, mid=0.0)
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=g, mid=0.0,
            bn=128, bkp=128, interpret=True,
        )
        assert compute_error(ref, out) > 35


class TestDispatchIntegration:
    def test_qlinear_pallas_path_matches_xla(self):
        """Force the Pallas path through ops.linear and compare to the XLA
        dequant path (interpret mode)."""
        from torchao_tpu import ops
        from torchao_tpu.models.llama.model import default_linear_filter
        from torchao_tpu.quantization.quant_api import (
            Int4WeightOnlyConfig,
            quantize_,
        )
        from torchao_tpu.kernels import int4_matmul as m

        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(256, 512), jnp.bfloat16)
        x = jnp.asarray(rs.randn(4, 512), jnp.bfloat16)
        qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=32))["w"]

        impl = m.int4_dq_matmul_available(x, qw)
        assert impl is not None, "probe should accept aligned shapes"
        ref = ops.linear(x, qw)  # XLA path on CPU

        # run kernel in interpret mode with same qparams
        mid = (qw.quant_max + qw.quant_min + 1) / 2 - qw.quant_min
        out = m.int4_dq_matmul(
            x, qw.qdata, qw.scale, qw.zero_point,
            group_size=qw.block_size[-1], mid=mid,
            bn=128, bkp=128, interpret=True,
        )
        err = compute_error(ref, out)
        assert err > 30, f"pallas vs xla path SQNR {err}"

    def test_probe_rejects_misaligned(self):
        from torchao_tpu.kernels import int4_matmul as m
        from torchao_tpu.quantization.quant_api import (
            Int4WeightOnlyConfig,
            quantize_,
        )

        rs = np.random.RandomState(3)
        w = jnp.asarray(rs.randn(100, 96), jnp.bfloat16)  # misaligned
        x = jnp.asarray(rs.randn(4, 96), jnp.bfloat16)
        qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=32))["w"]
        assert m.int4_dq_matmul_available(x, qw) is None
