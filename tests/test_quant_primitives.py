"""Exact-value and golden-parity tests for the quant primitive ops.

Mirrors the reference's test strategy
(``test/quantization/test_quant_primitives.py``): exact-value tests vs
hand-computed results, plus parity vs the reference implementation run on
CPU torch (bit-exact in fp32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
)

from reference_oracle import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference torchao not importable"
)


class TestReductionParams:
    def test_doc_example(self):
        shape, dims = qp.get_reduction_params((3, 3, 2, 10), (3, 3, 10, 10))
        assert shape == [3, 3, 5, 2, 10]
        assert dims == [0, 1, 3, 4]

    def test_per_tensor(self):
        shape, dims = qp.get_reduction_params((4, 8), (4, 8))
        assert shape == [4, 8]
        assert dims == [0, 1]

    def test_per_row(self):
        shape, dims = qp.get_reduction_params((1, 8), (4, 8))
        assert shape == [4, 8]
        assert dims == [1]

    def test_per_group(self):
        shape, dims = qp.get_reduction_params((1, 4), (4, 8))
        assert shape == [4, 2, 4]
        assert dims == [2]


class TestExactValues:
    def test_symmetric_int8_per_tensor(self):
        x = jnp.array([[-4.0, 2.0], [1.0, 3.0]])
        scale, zp = qp.choose_qparams_affine(
            x, MappingType.SYMMETRIC, (2, 2), "int8"
        )
        # scale = max(|-4|, 3) / ((127 - (-128)) / 2) = 4 / 127.5
        np.testing.assert_allclose(np.asarray(scale), 4.0 / 127.5, rtol=1e-6)
        assert int(zp) == 0  # (127 + (-128) + 1) / 2 = 0

    def test_asymmetric_int8_per_tensor(self):
        x = jnp.array([[1.0, 2.0], [3.0, 5.0]])
        scale, zp = qp.choose_qparams_affine(
            x, MappingType.ASYMMETRIC, (2, 2), "int8"
        )
        # min- = min(1, 0) = 0; max+ = 5 → scale = 5/255, zp = -128 - round(0)
        np.testing.assert_allclose(np.asarray(scale), 5.0 / 255.0, rtol=1e-6)
        assert int(zp) == -128

    def test_tinygemm_uint4_group(self):
        x = jnp.array([[1.0, 3.0, -2.0, 6.0]])
        scale, zp = qp.choose_qparams_affine_tinygemm(
            x, MappingType.ASYMMETRIC, (1, 4), "uint4", eps=1e-6
        )
        # scale = (6 - (-2)) / 15; zp = -2 + scale * 8 (mid = (15+0+1)/2 = 8)
        s = 8.0 / 15.0
        np.testing.assert_allclose(np.asarray(scale), s, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(zp), -2.0 + s * 8, rtol=1e-6)

    def test_quantize_dequantize_roundtrip_int8(self):
        x = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
        bs = (1, 16)
        scale, zp = qp.choose_qparams_affine(
            x, MappingType.ASYMMETRIC, bs, "int8"
        )
        q = qp.quantize_affine(x, bs, scale, zp, "int8")
        assert q.dtype == jnp.int8
        dq = qp.dequantize_affine(q, bs, scale, zp, "int8")
        # max error is scale/2 per element
        max_scale = float(jnp.max(scale))
        assert float(jnp.max(jnp.abs(dq - x))) <= max_scale / 2 + 1e-6

    def test_quantize_int_domain_formula(self):
        x = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        scale = jnp.array([0.5])
        zp = jnp.array([1], jnp.int32)
        q = qp.quantize_affine(x, (1, 4), scale, zp, "int8")
        np.testing.assert_array_equal(np.asarray(q), [[1, 3, 5, 7]])

    def test_tinygemm_quant_dequant(self):
        x = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.float32)
        bs = (1, 8)
        scale, zp = qp.choose_qparams_affine_tinygemm(
            x, MappingType.ASYMMETRIC, bs, "uint4", eps=1e-6
        )
        q = qp.quantize_affine_tinygemm(x, bs, scale, zp, "uint4")
        assert int(jnp.min(q)) >= 0 and int(jnp.max(q)) <= 15
        dq = qp.dequantize_affine_tinygemm(
            q, bs, scale, zp, "uint4", 0, 15
        )
        max_scale = float(jnp.max(scale))
        assert float(jnp.max(jnp.abs(dq - x))) <= max_scale / 2 + 1e-5

    def test_no_zero_point(self):
        x = jnp.array([[-1.0, 0.5, 2.0, -0.25]])
        scale = jnp.array([0.25])
        q = qp.quantize_affine_no_zero_point(
            x, (1, 4), scale, None, "int8"
        )
        np.testing.assert_array_equal(np.asarray(q), [[-4, 2, 8, -1]])
        dq = qp.dequantize_affine_no_zero_point(q, (1, 4), scale)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(x))

    def test_float8_scale_and_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(2).randn(4, 8), jnp.float32)
        scale = qp.choose_scale_float8(x, (1, 8))
        assert scale.shape == (4, 1)
        amax = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(scale), amax / 448.0, rtol=1e-6
        )
        q = qp.quantize_affine_float8(x, scale)
        assert q.dtype == jnp.float8_e4m3fn
        dq = qp.dequantize_affine_float8(q, scale)
        # fp8 e4m3 has ~2 decimal digits; SQNR should be > 25 dB
        from torchao_tpu.utils import compute_error

        assert compute_error(x, dq) > 25

    def test_per_token_absmax(self):
        x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 16), jnp.float32)
        q, scale = qp.quantize_activation_per_token_absmax(x)
        assert q.dtype == jnp.int8
        assert scale.shape == (2, 3)
        assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127

    def test_round_ste_gradient(self):
        g = jax.grad(lambda v: jnp.sum(qp.round_ste(v * 3.0)))(
            jnp.ones((4,))
        )
        np.testing.assert_allclose(np.asarray(g), 3.0)

    def test_fake_quantize_matches_q_dq(self):
        x = jnp.asarray(np.random.RandomState(4).randn(4, 16), jnp.float32)
        bs = (1, 8)
        scale, zp = qp.choose_qparams_affine(
            x, MappingType.ASYMMETRIC, bs, "int8"
        )
        fq = qp.fake_quantize_affine(x, bs, scale, zp, "int8")
        q = qp.quantize_affine(x, bs, scale, zp, "int8")
        dq = qp.dequantize_affine(q, bs, scale, zp, "int8")
        np.testing.assert_allclose(np.asarray(fq), np.asarray(dq), atol=1e-6)


@requires_reference
class TestReferenceParity:
    """Bit-exact (fp32) parity vs the reference implementation on CPU."""

    def _rand(self, shape, seed=0):
        return np.random.RandomState(seed).randn(*shape).astype(np.float32)

    @pytest.mark.parametrize(
        "mapping", [MappingType.SYMMETRIC, MappingType.ASYMMETRIC]
    )
    @pytest.mark.parametrize("block", [(1, 32), (1, 128), (4, 128)])
    def test_choose_qparams_affine(self, mapping, block):
        import torch
        from torchao.quantization.quant_primitives import (
            MappingType as RefMapping,
            choose_qparams_affine as ref_choose,
        )

        xn = self._rand((4, 128))
        ref_s, ref_z = ref_choose(
            torch.from_numpy(xn),
            getattr(RefMapping, mapping.name),
            block,
            torch.int8,
        )
        s, z = qp.choose_qparams_affine(
            jnp.asarray(xn), mapping, block, "int8"
        )
        np.testing.assert_allclose(
            np.asarray(s), ref_s.numpy(), rtol=0, atol=0
        )
        np.testing.assert_array_equal(np.asarray(z), ref_z.numpy())

    @pytest.mark.parametrize("group", [32, 64, 128])
    def test_tinygemm_qparams_and_quant(self, group):
        import torch
        from torchao.quantization.quant_primitives import (
            MappingType as RefMapping,
            _choose_qparams_affine_tinygemm,
            _quantize_affine_tinygemm,
            _dequantize_affine_tinygemm,
        )

        xn = self._rand((8, 256), seed=1)
        block = (1, group)
        ref_s, ref_z = _choose_qparams_affine_tinygemm(
            torch.from_numpy(xn),
            RefMapping.ASYMMETRIC,
            block,
            torch.int32,
            quant_min=0,
            quant_max=15,
            eps=1e-6,
        )
        s, z = qp.choose_qparams_affine_tinygemm(
            jnp.asarray(xn),
            MappingType.ASYMMETRIC,
            block,
            "int32",
            quant_min=0,
            quant_max=15,
            eps=1e-6,
        )
        np.testing.assert_allclose(np.asarray(s), ref_s.numpy(), atol=0)
        np.testing.assert_allclose(np.asarray(z), ref_z.numpy(), atol=0)

        ref_q = _quantize_affine_tinygemm(
            torch.from_numpy(xn), block, ref_s, ref_z, torch.int32, 0, 15
        )
        q = qp.quantize_affine_tinygemm(
            jnp.asarray(xn), block, s, z, "int32", 0, 15
        )
        np.testing.assert_array_equal(
            np.asarray(q, np.int32), ref_q.numpy().astype(np.int32)
        )

        ref_dq = _dequantize_affine_tinygemm(
            ref_q, block, ref_s, ref_z, torch.int32, 0, 15
        )
        dq = qp.dequantize_affine_tinygemm(
            q.astype(jnp.float32), block, s, z, None, 0, 15
        )
        np.testing.assert_allclose(
            np.asarray(dq), ref_dq.numpy(), rtol=1e-6, atol=1e-6
        )

    def test_int8_weight_symmetric_parity(self):
        """Int8WeightOnlyConfig weight path: symmetric per-channel."""
        import torch
        from torchao.quantization.quant_primitives import (
            MappingType as RefMapping,
            choose_qparams_affine as ref_choose,
            quantize_affine as ref_quant,
        )

        xn = self._rand((16, 64), seed=2)
        block = (1, 64)
        ref_s, ref_z = ref_choose(
            torch.from_numpy(xn),
            RefMapping.SYMMETRIC,
            block,
            torch.int8,
            eps=np.finfo(np.float32).eps,
            zero_point_dtype=torch.int64,
        )
        s, z = qp.choose_qparams_affine(
            jnp.asarray(xn),
            MappingType.SYMMETRIC,
            block,
            "int8",
            eps=float(np.finfo(np.float32).eps),
        )
        np.testing.assert_allclose(np.asarray(s), ref_s.numpy(), atol=0)
        ref_q = ref_quant(
            torch.from_numpy(xn), block, ref_s, ref_z, torch.int8
        )
        q = qp.quantize_affine(jnp.asarray(xn), block, s, z, "int8")
        np.testing.assert_array_equal(np.asarray(q), ref_q.numpy())

    def test_per_token_absmax_parity(self):
        import torch
        from torchao.quantization.utils import (
            _quantize_activation_per_token_absmax,
        )

        xn = self._rand((2, 5, 64), seed=3)
        ref_q, ref_s = _quantize_activation_per_token_absmax(
            torch.from_numpy(xn)
        )
        q, s = qp.quantize_activation_per_token_absmax(jnp.asarray(xn))
        np.testing.assert_array_equal(np.asarray(q), ref_q.numpy())
        np.testing.assert_allclose(
            np.asarray(s), ref_s.numpy().reshape(np.asarray(s).shape),
            rtol=1e-7,
        )

    def test_float8_scale_parity(self):
        import torch
        from torchao.quantization.quant_primitives import (
            _choose_scale_float8,
            _quantize_affine_float8,
        )

        xn = self._rand((16, 64), seed=4)
        block = [1, 64]
        ref_s = _choose_scale_float8(
            torch.from_numpy(xn), block, torch.float8_e4m3fn
        )
        s = qp.choose_scale_float8(jnp.asarray(xn), block)
        np.testing.assert_allclose(np.asarray(s), ref_s.numpy(), atol=0)
        ref_q = _quantize_affine_float8(torch.from_numpy(xn), ref_s)
        q = qp.quantize_affine_float8(jnp.asarray(xn), s)
        np.testing.assert_array_equal(
            np.asarray(q).astype(np.float32),
            ref_q.to(torch.float32).numpy(),
        )

    def test_hqq_improves_over_plain(self):
        """HQQ solver should not be worse than plain min-max on dequant MSE."""
        from torchao_tpu.quantization.quant_primitives import (
            choose_qparams_and_quantize_affine_hqq,
        )

        xn = self._rand((32, 128), seed=5)
        x = jnp.asarray(xn)
        q, s, z, _ = choose_qparams_and_quantize_affine_hqq(
            x, nbits=4, group_size=64, optimize=True
        )
        dq = (
            (q.reshape(-1, 64).astype(jnp.float32)
             - z.reshape(-1, 1))
            * s.reshape(-1, 1)
        ).reshape(32, 128)
        err_hqq = float(jnp.mean((dq - x) ** 2))

        q0, s0, z0, _ = choose_qparams_and_quantize_affine_hqq(
            x, nbits=4, group_size=64, optimize=False
        )
        dq0 = (
            (q0.reshape(-1, 64).astype(jnp.float32)
             - z0.reshape(-1, 1))
            * s0.reshape(-1, 1)
        ).reshape(32, 128)
        err_plain = float(jnp.mean((dq0 - x) ** 2))
        assert err_hqq <= err_plain * 1.05


class TestGGUF:
    def test_double_quant_roundtrip(self):
        x = jnp.asarray(
            np.random.RandomState(0).randn(8, 256), jnp.float32
        )
        bs = (1, 32)  # 8 blocks per row → one super block of 8
        sss, sms, qs, qm = qp.choose_qparams_gguf(x, bs, "uint4")
        assert qs.dtype == jnp.uint8 and qm.dtype == jnp.int8
        assert sss.shape == (8, 1, 1)
        q = qp.quantize_gguf(x, bs, "uint4", sss, sms, qs, qm)
        assert int(jnp.min(q)) >= 0 and int(jnp.max(q)) <= 15
        dq = qp.dequantize_gguf(q, bs, "uint4", sss, sms, qs, qm)
        from torchao_tpu.utils import compute_error

        err = compute_error(x, dq)
        assert err > 14, err  # ~4-bit fidelity w/ 6-bit double-quant scales


class TestQQQ:
    """Marlin-QQQ two-level qparams (reference `quant_primitives.py:1580`)."""

    @pytest.mark.parametrize("group_size", [128, -1])
    def test_roundtrip(self, group_size):
        x = jnp.asarray(np.random.RandomState(0).randn(16, 256), jnp.float32)
        q_w, s_group, s_channel, w_ref = (
            qp.choose_qparams_and_quantize_affine_qqq(x, 4, group_size)
        )
        if group_size == 128:
            assert s_group.shape == (16, 2) and s_group.dtype == jnp.float16
            assert int(jnp.min(q_w)) >= 0 and int(jnp.max(q_w)) <= 15
        else:
            assert s_group.size == 0
            assert int(jnp.min(q_w)) >= -7 and int(jnp.max(q_w)) <= 7
        assert s_channel.shape == (16, 1) and s_channel.dtype == jnp.float32
        dq = qp.dequantize_affine_qqq(q_w, s_group, s_channel, 4, group_size)
        from torchao_tpu.utils import compute_error

        # dequant uses the fp16-fused scales (reference semantics); w_ref
        # carries the int8 re-quantization, so allow ~s_channel/2 slack
        atol = float(jnp.max(jnp.abs(s_channel))) * 0.6 + 1e-3
        np.testing.assert_allclose(
            np.asarray(dq, np.float32), np.asarray(w_ref, np.float32),
            rtol=2e-2, atol=atol,
        )
        assert compute_error(x, dq.astype(jnp.float32)) > 14

    @requires_reference
    @pytest.mark.parametrize("group_size", [128, -1])
    def test_matches_reference(self, group_size):
        import torch

        rqp = __import__(
            "torchao.quantization.quant_primitives", fromlist=["x"]
        )
        x_np = np.random.RandomState(1).randn(8, 256).astype(np.float32)
        qw_r, sg_r, sc_r, wref_r = (
            rqp._choose_qparams_and_quantize_affine_qqq(
                torch.from_numpy(x_np), 4, group_size
            )
        )
        qw_j, sg_j, sc_j, wref_j = (
            qp.choose_qparams_and_quantize_affine_qqq(
                jnp.asarray(x_np), 4, group_size
            )
        )
        np.testing.assert_array_equal(
            np.asarray(qw_j), qw_r.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(sc_j), sc_r.numpy(), rtol=1e-6
        )
        if group_size == 128:
            np.testing.assert_allclose(
                np.asarray(sg_j, np.float32),
                sg_r.float().numpy(), rtol=1e-3,
            )
        np.testing.assert_allclose(
            np.asarray(wref_j, np.float32), wref_r.float().numpy(),
            rtol=1e-3, atol=1e-4,
        )
