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


def _make_int4_operands(rs, M, N, K, g):
    """K-major operands: wp [K/2, N], scale/zero [K/g, N]."""
    x = jnp.asarray(rs.randn(M, K), jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rs.randint(0, 16, (N, K)), jnp.uint8)
    wp = pack_int4(q, axis=-1).T  # [K/2, N]
    scale = jnp.asarray(rs.rand(N, K // g) * 0.1 + 0.01, jnp.bfloat16).T
    zero = jnp.asarray(rs.randn(N, K // g) * 0.1, jnp.bfloat16).T
    return x, wp, scale, zero


class TestInt4DqMatmul:
    @pytest.mark.parametrize("M", [1, 8, 64])
    @pytest.mark.parametrize("group_size", [32, 128])
    def test_matches_reference(self, M, group_size):
        rs = np.random.RandomState(0)
        N, K = 256, 512
        x, wp, scale, zero = _make_int4_operands(rs, M, N, K, group_size)

        ref = int4_dq_matmul_reference(
            x, wp, scale, zero, group_size=group_size
        )
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=group_size,
            bn=128, bkp=256, interpret=True,
        )
        assert out.shape == (M, N) and out.dtype == x.dtype
        err = compute_error(ref, out)
        assert err > 35, f"kernel mismatch: SQNR {err}"

    def test_mid_zero(self):
        rs = np.random.RandomState(1)
        M, N, K, g = 4, 256, 256, 32
        x, wp, scale, zero = _make_int4_operands(rs, M, N, K, g)
        ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g, mid=0.0)
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=g, mid=0.0,
            bn=128, bkp=128, interpret=True,
        )
        assert compute_error(ref, out) > 35

    def test_group_larger_than_half(self):
        """group_size == K (per-row): groups span both packed halves."""
        rs = np.random.RandomState(2)
        M, N, K = 4, 256, 256
        # per-row scale: one group of size K; kernel clamps g_eff to K/2
        # and the caller must provide [K/g_eff, N]-shaped scales — probe
        # rejects this case, so just verify the grouped path at g = K/2
        g = K // 2
        x, wp, scale, zero = _make_int4_operands(rs, M, N, K, g)
        ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g)
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=g, interpret=True
        )
        assert compute_error(ref, out) > 35


class TestInt8ScaledMatmul:
    @pytest.mark.parametrize("M", [1, 32, 128])
    def test_matches_reference(self, M):
        from torchao_tpu.kernels.int8_matmul import (
            int8_scaled_matmul,
            int8_scaled_matmul_reference,
        )

        rs = np.random.RandomState(0)
        N, K = 256, 512
        x_q = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)
        w_q = jnp.asarray(rs.randint(-127, 128, (N, K)), jnp.int8)
        xs = jnp.asarray(rs.rand(M) * 0.02 + 0.001, jnp.float32)
        ws = jnp.asarray(rs.rand(N) * 0.02 + 0.001, jnp.float32)
        ref = int8_scaled_matmul_reference(x_q, w_q, xs, ws)
        out = int8_scaled_matmul(
            x_q, w_q, xs, ws, bn=128, bk=256, interpret=True
        )
        assert compute_error(ref, out) > 40

    def test_dispatch_probe(self):
        from torchao_tpu.kernels.int8_matmul import (
            int8_scaled_matmul_available,
        )
        from torchao_tpu.quantization.quant_api import (
            Int8DynamicActivationInt8WeightConfig,
            quantize_,
        )
        from torchao_tpu import ops

        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(256, 512), jnp.bfloat16)
        x = jnp.asarray(rs.randn(8, 512), jnp.bfloat16)
        laqt = quantize_({"w": w}, Int8DynamicActivationInt8WeightConfig())["w"]
        inner = laqt.original_weight
        x_q, x_scale = laqt.quantize_input(x)
        impl = int8_scaled_matmul_available(x_q, inner)
        assert impl is not None
        # compare the XLA dispatch result vs the kernel reference math
        ref = ops.linear(x, laqt)
        from torchao_tpu.kernels.int8_matmul import (
            int8_scaled_matmul_reference,
        )

        out = int8_scaled_matmul_reference(
            x_q, inner.qdata, x_scale, inner.scale.reshape(-1)
        )
        assert compute_error(ref, out) > 35


class TestFp8RowwiseMatmul:
    @pytest.mark.parametrize("M", [1, 32])
    def test_matches_reference(self, M):
        from torchao_tpu.kernels.fp8_matmul import (
            fp8_rowwise_matmul,
            fp8_rowwise_matmul_reference,
        )

        rs = np.random.RandomState(0)
        N, K = 256, 512
        x_q = jnp.asarray(rs.randn(M, K), jnp.float32).astype(
            jnp.float8_e4m3fn
        )
        w_q = jnp.asarray(rs.randn(N, K), jnp.float32).astype(
            jnp.float8_e4m3fn
        )
        xs = jnp.asarray(rs.rand(M) * 0.02 + 0.001, jnp.float32)
        ws = jnp.asarray(rs.rand(N) * 0.02 + 0.001, jnp.float32)
        ref = fp8_rowwise_matmul_reference(x_q, w_q, xs, ws)
        out = fp8_rowwise_matmul(
            x_q, w_q, xs, ws, bn=128, bk=256, interpret=True
        )
        assert compute_error(ref, out) > 40


class TestDispatchIntegration:
    def test_qlinear_pallas_path_matches_xla(self):
        """Kernel output vs the XLA dequant path for an Int4WeightOnly
        weight produced by quantize_ (same qparams, same packing)."""
        from torchao_tpu import ops
        from torchao_tpu.quantization.quant_api import (
            Int4WeightOnlyConfig,
            quantize_,
        )
        from torchao_tpu.kernels import int4_matmul as m

        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(256, 512), jnp.bfloat16)
        x = jnp.asarray(rs.randn(4, 512), jnp.bfloat16)
        qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=32))["w"]
        assert qw.qdata.shape == (256, 256)  # [K/2, N] K-major

        impl = m.int4_dq_matmul_available(x, qw)
        assert impl is not None, "probe should accept aligned shapes"
        ref = ops.linear(x, qw)  # XLA path on CPU

        mid = (qw.quant_max + qw.quant_min + 1) / 2 - qw.quant_min
        out = m.int4_dq_matmul(
            x, qw.qdata, qw.scale, qw.zero_point,
            group_size=qw.block_size[-1], mid=mid,
            bn=128, bkp=256, interpret=True,
            xored=qw.nibbles_xored,
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


class TestAutotune:
    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        import os
        from torchao_tpu.kernels import autotune as at

        monkeypatch.setenv(
            "TORCHAO_TPU_AUTOTUNE_CACHE", str(tmp_path / "cache.json")
        )
        monkeypatch.setenv("TORCHAO_TPU_AUTOTUNE", "1")
        at._cache = None  # reset module cache

        traces = []

        def run(cfg, xi):
            # run() must be TRACEABLE (it is timed inside one jitted
            # fori_loop — time_amortized); make bn=512 do far less work
            # so the argmin is robust on any backend
            traces.append(cfg)
            y = xi
            reps = 1 if cfg["bn"] == 512 else 60
            for _ in range(reps):
                y = y @ y
            return y

        x = jnp.eye(256, dtype=jnp.float32)
        cands = [{"bn": 256}, {"bn": 512}]
        best = at.lookup_or_tune(
            "k", (8, 128, 128, 32), cands, run, iters=3, example_x=x
        )
        assert best == {"bn": 512}
        n_traces = len(traces)

        # second lookup hits the JSON cache — no re-timing (run never
        # re-traced), even with a fresh in-memory cache
        at._cache = None
        best2 = at.lookup_or_tune(
            "k", (8, 128, 128, 32), cands, run, iters=3, example_x=x
        )
        assert best2 == {"bn": 512}
        assert len(traces) == n_traces

        # without example_x and with no cache entry: heuristics (None)
        at._cache = None
        assert (
            at.lookup_or_tune("k2", (1, 2), cands, run, iters=2) is None
        )

    def test_disabled_returns_none(self, tmp_path, monkeypatch):
        from torchao_tpu.kernels import autotune as at

        monkeypatch.setenv(
            "TORCHAO_TPU_AUTOTUNE_CACHE", str(tmp_path / "c2.json")
        )
        monkeypatch.delenv("TORCHAO_TPU_AUTOTUNE", raising=False)
        at._cache = None
        out = at.lookup_or_tune(
            "k", (1, 2), [{"bn": 1}], lambda c: jnp.zeros(1)
        )
        assert out is None


class TestW4A8Matmul:
    def _operands(self, rs, M, N, K, g):
        from torchao_tpu.qtypes.packing import pack_int4

        q = rs.randint(-8, 8, (N, K)).astype(np.int8)
        nib = (q + 8).astype(np.uint8)
        wp = jnp.asarray(
            np.asarray(pack_int4(jnp.asarray(nib), axis=-1)).T
        )  # [K/2, N] K-major
        ws = jnp.asarray(
            (rs.rand(K // g, N) * 0.05 + 0.01).astype(np.float32)
        )
        x_q = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)
        x_s = jnp.asarray(rs.rand(M).astype(np.float32) * 0.02 + 0.001)
        return x_q, x_s, wp, ws

    @pytest.mark.parametrize("M,g", [(1, 32), (8, 32), (16, 64)])
    def test_matches_reference(self, M, g):
        from torchao_tpu.kernels.w4a8_matmul import (
            w4a8_dq_matmul,
            w4a8_dq_matmul_reference,
        )

        rs = np.random.RandomState(0)
        N, K = 256, 512
        x_q, x_s, wp, ws = self._operands(rs, M, N, K, g)
        ref = w4a8_dq_matmul_reference(
            x_q, x_s, wp, ws, group_size=g, out_dtype=jnp.float32
        )
        out = w4a8_dq_matmul(
            x_q, x_s, wp, ws, group_size=g, out_dtype=jnp.float32,
            bn=128, interpret=True,
        )
        # integer-exact partials + f32 scale math: near machine parity
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_8da4w_config_takes_tiled_layout(self):
        from torchao_tpu.qtypes.base import PackingFormat
        from torchao_tpu.qtypes.composition import (
            LinearActivationQuantizedArray,
        )
        from torchao_tpu.quantization.quant_api import (
            Int8DynamicActivationInt4WeightConfig,
            quantize_,
        )
        from torchao_tpu.utils import compute_error

        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(128, 512) * 0.1, jnp.bfloat16)
        qw = quantize_(
            {"w": w}, Int8DynamicActivationInt4WeightConfig(group_size=32),
            filter_fn=lambda p, l: True,
        )["w"]
        assert isinstance(qw, LinearActivationQuantizedArray)
        inner = qw.original_weight
        assert inner.packing_format is PackingFormat.TILED_NIBBLES
        assert inner.zero_point is None
        # dequant numerics unchanged vs the PLAIN layout
        x = jnp.asarray(rs.randn(4, 512), jnp.bfloat16)
        from torchao_tpu import ops

        out = ops.linear(x, qw)
        ref = jnp.matmul(x, w.T)
        assert compute_error(ref, out) > 18

    def test_kernel_vs_laqt_path(self, monkeypatch):
        """The fused kernel must match the QDQ laqt path bit-for-bit in
        the int32 partial domain (same act quant, same weight grid).
        The kernel is opt-in (slow on this platform — see its probe)."""
        monkeypatch.setenv("TORCHAO_TPU_ENABLE_PALLAS_W4A8", "1")
        from torchao_tpu.kernels.w4a8_matmul import (
            w4a8_dq_matmul,
            w4a8_dq_matmul_available,
        )
        from torchao_tpu.quantization.quant_api import (
            Int8DynamicActivationInt4WeightConfig,
            quantize_,
        )
        from torchao_tpu.quantization.quant_primitives import (
            quantize_activation_per_token_absmax,
        )
        from torchao_tpu.utils import compute_error

        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(128, 512) * 0.1, jnp.float32)
        qw = quantize_(
            {"w": w}, Int8DynamicActivationInt4WeightConfig(group_size=32),
            filter_fn=lambda p, l: True,
        )["w"]
        inner = qw.original_weight
        # pre-XORed storage declines the w4a8 kernel (the 8da4w
        # centered-act path covers it); un-XOR for this kernel's test
        import dataclasses as _dc

        inner = _dc.replace(
            inner, qdata=inner.qdata ^ jnp.uint8(0x80),
            nibbles_xored=False,
        )
        impl = w4a8_dq_matmul_available(inner)
        assert impl is not None
        x = jnp.asarray(rs.randn(4, 512), jnp.float32)
        x_q, x_s = quantize_activation_per_token_absmax(x)
        out = w4a8_dq_matmul(
            x_q, x_s, inner.qdata, inner.scale, group_size=32,
            out_dtype=jnp.float32, interpret=True,
        )
        # laqt QDQ path on the same quantized operands
        x_dq = x_q.astype(jnp.float32) * x_s[:, None]
        ref = x_dq @ inner.dequantize(jnp.float32).T
        assert compute_error(ref, out) > 45


def test_int4_group_partial_variant_matches():
    """The scale-on-partials kernel variant must match the fused one."""
    from torchao_tpu.kernels.int4_matmul import (
        int4_dq_matmul,
        int4_dq_matmul_reference,
    )

    rs = np.random.RandomState(5)
    M, N, K, g = 8, 256, 512, 32
    x, wp, scale, zero = _make_int4_operands(rs, M, N, K, g)
    ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g)
    out = int4_dq_matmul(
        x, wp, scale, zero, group_size=g, bn=128,
        variant="group_partial", interpret=True,
    )
    assert compute_error(ref, out) > 35


def test_8da4w_centered_act_path():
    """The 8da4w hot path feeds zero-point-centered int8 activations
    (exact in bf16: |q − zp| ≤ 255 < 2⁸) into the int4 Pallas kernel —
    output must match the exact integer-math oracle on the same
    quantized operands, for BOTH act mapping types."""
    from torchao_tpu import ops
    from torchao_tpu.ops.qlinear import _check_8da4w_centered
    from torchao_tpu.qtypes.base import KernelPreference, PackingFormat
    from torchao_tpu.quantization.quant_api import (
        Int8DynamicActivationInt4WeightConfig,
        quantize_,
    )
    from torchao_tpu.quantization.quant_primitives import MappingType

    rs = np.random.RandomState(13)
    w = jnp.asarray(rs.randn(128, 512) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rs.randn(4, 512), jnp.bfloat16)
    for act_mt in (MappingType.ASYMMETRIC, MappingType.SYMMETRIC):
        cfg = Int8DynamicActivationInt4WeightConfig(
            group_size=32, act_mapping_type=act_mt
        )
        qw = quantize_({"w": w}, cfg, filter_fn=lambda p, l: True)["w"]
        inner = qw.original_weight
        assert inner.packing_format is PackingFormat.TILED_NIBBLES
        assert _check_8da4w_centered(x, qw, None)
        out = ops.linear(
            x, qw, kernel_preference=KernelPreference.PALLAS
        )
        # exact oracle: integer matmul on the same quantized operands
        quantized = qw.quantize_input(x)
        if len(quantized) == 3:
            q, s, zp = quantized
            xc = q.astype(jnp.float64) - zp.astype(jnp.float64)[:, None]
        else:
            q, s = quantized
            xc = q.astype(jnp.float64)
        wq = inner.unpacked_qdata().astype(jnp.float64)  # [N, K], −8..7
        sw = jnp.repeat(
            jnp.swapaxes(inner.scale, -1, -2).astype(jnp.float64),
            32, axis=-1,
        )                                                # [N, K]
        ref = (xc @ (wq * sw).T) * s.astype(jnp.float64)[:, None]
        err = compute_error(
            jnp.asarray(ref, jnp.float32), jnp.asarray(out, jnp.float32)
        )
        assert err > 38, (act_mt, err)


def test_int4_kernel_symmetric_no_zp_dispatch():
    """The int4 Pallas gate accepts symmetric TILED weights (the 8da4w
    inner weight): kernel output must match dequant+matmul."""
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul_available
    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray
    from torchao_tpu.quantization.quant_primitives import (
        MappingType,
        ZeroPointDomain,
    )

    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.randn(128, 512) * 0.1, jnp.float32)
    qw = IntxArray.from_hp(
        w, MappingType.SYMMETRIC, (1, 32), "int4",
        quant_min=-8, quant_max=7,
        zero_point_domain=ZeroPointDomain.NONE,
        packing_format=PackingFormat.TILED_NIBBLES,
    )
    impl = int4_dq_matmul_available(None, qw)
    assert impl is not None
    x = jnp.asarray(rs.randn(4, 512), jnp.float32)
    out = impl(x, qw)
    ref = x @ qw.dequantize(jnp.float32).T
    assert compute_error(ref, out) > 30


def test_int4_batched_int8_variant_matches():
    """The batched-int8 variant (zero weight casts, scale on f32 group
    partials) must match the fused variant and the oracle."""
    from torchao_tpu.kernels.int4_matmul import (
        int4_dq_matmul,
        int4_dq_matmul_reference,
    )

    rng = np.random.RandomState(5)
    M, K, N, g = 8, 1024, 256, 32
    Kp = K // 2
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wp = jnp.asarray(rng.randint(0, 256, (Kp, N)), jnp.uint8)
    scale = jnp.asarray(rng.rand(K // g, N) * 0.01 + 0.005, jnp.bfloat16)
    zero = jnp.asarray(rng.randn(K // g, N) * 0.02, jnp.bfloat16)

    ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g)
    out = int4_dq_matmul(
        x, wp, scale, zero, group_size=g,
        variant="batched_int8", interpret=True,
    )
    err = compute_error(
        jnp.asarray(ref, jnp.float32), jnp.asarray(out, jnp.float32)
    )
    assert err > 40, err

    # symmetric no-zero path (8da4w inner weight): zero = 0
    z0 = jnp.zeros_like(zero)
    ref0 = int4_dq_matmul_reference(x, wp, scale, z0, group_size=g)
    out0 = int4_dq_matmul(
        x, wp, scale, z0, group_size=g,
        variant="batched_int8", interpret=True,
    )
    assert compute_error(
        jnp.asarray(ref0, jnp.float32), jnp.asarray(out0, jnp.float32)
    ) > 40


def test_int4_scale_eff_precompute_matches_derived():
    """from_hp populates the interleaved qparams_eff on TILED weights
    and the kernel produces identical results whether qparams are
    precomputed or derived per call."""
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig, quantize_,
    )

    rng = np.random.RandomState(9)
    N, K, g = 256, 1024, 32
    w = jnp.asarray(rng.randn(N, K), jnp.bfloat16)
    qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=g))["w"]
    assert qw.qparams_eff is not None
    nG = qw.scale.shape[0] // 2
    assert qw.qparams_eff.shape == (4 * nG, N)
    qe = np.asarray(qw.qparams_eff, np.float32)
    # family blocks: s_lo rows then s_hi/16 (÷16 exact in bf16)
    np.testing.assert_array_equal(
        qe[:nG], np.asarray(qw.scale[:nG], np.float32)
    )
    np.testing.assert_array_equal(
        qe[nG:2 * nG], np.asarray(qw.scale[nG:], np.float32) / 16.0,
    )

    x = jnp.asarray(rng.randn(4, K), jnp.bfloat16)
    out_derived = int4_dq_matmul(
        x, qw.qdata, qw.scale, qw.zero_point,
        group_size=g, variant="batched_int8", interpret=True,
    )
    out_pre = int4_dq_matmul(
        x, qw.qdata, qw.scale, qw.zero_point,
        qw.qparams_eff,
        group_size=g, variant="batched_int8", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_derived, np.float32),
        np.asarray(out_pre, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16-vs-f32 scale rounding only
    )


def test_int4_kernel_accepts_hqq_int_domain():
    """HQQ int4 (INT zero-point domain) routes through the Pallas kernel
    via the precomputed float-equivalent zero (z = (mid-zp)*s)."""
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul_available
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig, quantize_,
    )
    from torchao_tpu import ops

    rng = np.random.RandomState(13)
    w = jnp.asarray(rng.randn(256, 1024), jnp.float32)
    qw = quantize_(
        {"w": w}, Int4WeightOnlyConfig(group_size=32, use_hqq=True)
    )["w"]
    assert qw.qparams_eff is not None
    assert int4_dq_matmul_available(None, qw) is not None

    x = jnp.asarray(rng.randn(2, 1024), jnp.float32)
    out = ops.linear(x, qw)
    ref = jnp.matmul(x, qw.dequantize(jnp.float32).T)
    assert compute_error(ref, out) > 25, compute_error(ref, out)

def test_int4_banded_variant_matches():
    """The banded fat-dot variant (one K=bkp contraction per nibble
    half) must match the oracle and the batched-int8 variant."""
    from torchao_tpu.kernels.int4_matmul import (
        int4_dq_matmul,
        int4_dq_matmul_reference,
    )

    rng = np.random.RandomState(11)
    for M in (1, 8):
        K, N, g = 2048, 256, 32
        Kp = K // 2
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        wp = jnp.asarray(rng.randint(0, 256, (Kp, N)), jnp.uint8)
        scale = jnp.asarray(
            rng.rand(K // g, N) * 0.01 + 0.005, jnp.bfloat16
        )
        zero = jnp.asarray(rng.randn(K // g, N) * 0.02, jnp.bfloat16)

        ref = int4_dq_matmul_reference(x, wp, scale, zero, group_size=g)
        out = int4_dq_matmul(
            x, wp, scale, zero, group_size=g,
            variant="banded", interpret=True,
        )
        outb = int4_dq_matmul(
            x, wp, scale, zero, group_size=g,
            variant="batched_int8", interpret=True,
        )
        err = compute_error(
            jnp.asarray(ref, jnp.float32), jnp.asarray(out, jnp.float32)
        )
        assert err > 40, (M, err)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(outb, np.float32)
        )

def test_int4_stacked_layer_idx_matches():
    """int4_dq_matmul with a stacked [L, Kp, N] weight + traced
    layer_idx (scalar-prefetch block indexing) must equal per-layer
    unstacked calls — including under lax.scan."""
    from torchao_tpu.kernels.int4_matmul import (
        int4_dq_matmul,
        int4_dq_matmul_reference,
    )

    rng = np.random.RandomState(12)
    L, K, N, g = 3, 2048, 2048, 32
    Kp = K // 2
    x = jnp.asarray(rng.randn(1, K), jnp.bfloat16)
    wp = jnp.asarray(rng.randint(0, 256, (L, Kp, N)), jnp.uint8)
    scale = jnp.asarray(
        rng.rand(L, K // g, N) * 0.01 + 0.005, jnp.bfloat16
    )
    zero = jnp.asarray(rng.randn(L, K // g, N) * 0.02, jnp.bfloat16)

    for l in range(L):
        stacked = int4_dq_matmul(
            x, wp, scale, zero, group_size=g,
            variant="batched_int8", interpret=True,
            layer_idx=jnp.int32(l),
        )
        single = int4_dq_matmul(
            x, wp[l], scale[l], zero[l], group_size=g,
            variant="batched_int8", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(stacked, np.float32),
            np.asarray(single, np.float32), rtol=0, atol=2e-6,
        )
        ref = int4_dq_matmul_reference(
            x, wp[l], scale[l], zero[l], group_size=g
        )
        err = compute_error(
            jnp.asarray(ref, jnp.float32),
            jnp.asarray(stacked, jnp.float32),
        )
        assert err > 40, (l, err)

    def layer(xc, l):
        o = int4_dq_matmul(
            xc, wp, scale, zero, group_size=g,
            variant="batched_int8", interpret=True, layer_idx=l,
        )
        return (o[:, :K] * 0.01).astype(jnp.bfloat16), o

    xs, outs = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
    xc = x
    for l in range(L):
        expect = int4_dq_matmul(
            xc, wp[l], scale[l], zero[l], group_size=g,
            variant="batched_int8", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(outs[l], np.float32),
            np.asarray(expect, np.float32), rtol=0, atol=2e-6,
        )
        xc = (expect[:, :K] * 0.01).astype(jnp.bfloat16)

def test_int8wo_stacked_layer_idx_matches():
    """int8wo_mixed_matmul with stacked [L, N, K] weights + traced
    layer_idx must match per-layer unstacked calls."""
    from torchao_tpu.kernels.int8_matmul import int8wo_mixed_matmul

    rng = np.random.RandomState(13)
    L, N, K = 3, 256, 512
    x = jnp.asarray(rng.randn(2, K), jnp.bfloat16)
    wq = jnp.asarray(rng.randint(-127, 128, (L, N, K)), jnp.int8)
    ws = jnp.asarray(rng.rand(L, N) * 0.02 + 0.01, jnp.float32)
    for l in range(L):
        stacked = int8wo_mixed_matmul(
            x, wq, ws, interpret=True, layer_idx=jnp.int32(l)
        )
        single = int8wo_mixed_matmul(
            x, wq[l], ws[l], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(stacked, np.float32),
            np.asarray(single, np.float32), rtol=0, atol=2e-6,
        )

def test_int8wo_no_partial_k_block():
    """K not a multiple of the default bk (e.g. SAM fc2's K=3072 vs
    bk=2048) must not leave a PARTIAL trailing K block: on hardware the
    out-of-bounds pad is undefined and corrupts every row's
    accumulation (found via NaN SAM int8wo outputs on TPU, round 5).
    The kernel now halves bk until it divides K; exactness checked in
    interpret mode, and the grid rule directly."""
    from torchao_tpu.kernels.int8_matmul import int8wo_mixed_matmul

    rng = np.random.RandomState(7)
    for N, K in [(768, 3072), (256, 1536)]:
        x = jnp.asarray(rng.randn(16, K), jnp.bfloat16)
        wq = jnp.asarray(rng.randint(-127, 128, (N, K)), jnp.int8)
        ws = jnp.asarray(rng.rand(N) * 0.02 + 0.01, jnp.float32)
        out = int8wo_mixed_matmul(x, wq, ws, interpret=True)
        ref = (
            x.astype(jnp.float32)
            @ (wq.astype(jnp.float32) * ws[:, None]).T
        )
        sqnr = 10 * np.log10(
            float(jnp.sum(ref**2))
            / max(float(jnp.sum((ref - out.astype(jnp.float32)) ** 2)),
                  1e-30)
        )
        assert sqnr > 30, (N, K, sqnr)
        # the block rule itself: the chosen bk must divide K
        bk = min(2048, K)
        while K % bk:
            bk //= 2
        assert K % bk == 0 and bk >= 128


def test_int4_merged_qparams_block_major_layout():
    """Eligible shapes (Kp % 1024 == 0) store qparams_eff in the chunked
    block-major layout (qparams_eff_chunk set) and the merged-DMA
    kernel matches the oracle and the family-major kernel bit-for-bit
    in its math path."""
    from torchao_tpu.kernels.int4_matmul import (
        eff_qparams_to_block_major,
        int4_dq_matmul,
        int4_dq_matmul_reference,
    )
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig, quantize_,
    )

    rng = np.random.RandomState(11)
    N, K, g = 256, 4096, 32          # Kp = 2048 → 2 canonical chunks
    w = jnp.asarray(rng.randn(N, K) * 0.05, jnp.bfloat16)
    qw = quantize_({"w": w}, Int4WeightOnlyConfig(group_size=g))["w"]
    assert qw.qparams_eff_chunk == 1024 // g
    nG = qw.scale.shape[0] // 2
    # block-major reorder round-trips from the family-major form
    s = np.asarray(qw.scale, np.float32)
    z = np.asarray(qw.zero_point, np.float32)
    fam = np.concatenate(
        [s[:nG], s[nG:] / 16.0, z[:nG] - 8.0 * s[:nG], z[nG:]],
        axis=0,
    )
    got_bm = np.asarray(qw.qparams_eff, np.float32)
    cb = qw.qparams_eff_chunk
    want_bm = np.asarray(
        eff_qparams_to_block_major(
            jnp.asarray(fam, jnp.float32), cb
        )
    )
    np.testing.assert_allclose(got_bm, want_bm, rtol=1e-2, atol=1e-3)

    x = jnp.asarray(rng.randn(2, K), jnp.bfloat16)
    ref = int4_dq_matmul_reference(
        x, qw.qdata, qw.scale, qw.zero_point, group_size=g
    )
    out_m = int4_dq_matmul(
        x, qw.qdata, qw.scale, qw.zero_point, qw.qparams_eff,
        group_size=g, variant="batched_int8", interpret=True,
        qparams_chunk=cb,
    )
    err = compute_error(
        jnp.asarray(ref, jnp.float32), jnp.asarray(out_m, jnp.float32)
    )
    assert err > 35, err
    # family-major path on the same weight (derive-on-the-fly)
    out_f = int4_dq_matmul(
        x, qw.qdata, qw.scale, qw.zero_point,
        group_size=g, variant="batched_int8", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_m, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_int4_merged_qparams_stacked_layer_idx():
    """Merged kernel with stacked [L, ...] weights + traced layer_idx
    (the decode scan path) matches per-layer unstacked calls."""
    from torchao_tpu.kernels.int4_matmul import (
        eff_qparams_to_block_major, int4_dq_matmul,
    )

    rng = np.random.RandomState(13)
    L, M, K, N, g = 3, 1, 4096, 256, 32
    Kp = K // 2
    cb = 1024 // g
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wp = jnp.asarray(rng.randint(0, 256, (L, Kp, N)), jnp.uint8)
    scale = jnp.asarray(
        rng.rand(L, K // g, N) * 0.01 + 0.005, jnp.bfloat16
    )
    zero = jnp.asarray(rng.randn(L, K // g, N) * 0.02, jnp.bfloat16)
    for l in range(L):
        got = int4_dq_matmul(
            x, wp, scale, zero, group_size=g,
            variant="batched_int8", interpret=True,
            layer_idx=jnp.int32(l), qparams_chunk=cb,
        )
        want = int4_dq_matmul(
            x, wp[l], scale[l], zero[l], group_size=g,
            variant="batched_int8", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )


def test_fp8_mixed_matmul_wo_and_dq():
    """fp8_mixed_matmul (interpret): bf16-act (fp8wo) and e4m3-act
    (fp8dq) paths match the f32 oracle within fp8 rounding."""
    from torchao_tpu.kernels.fp8_matmul import fp8_mixed_matmul

    rng = np.random.RandomState(3)
    M, N, K = 4, 256, 512
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wq = jnp.asarray(rng.randn(N, K), jnp.float8_e4m3fn)
    ws = jnp.asarray(rng.rand(N) * 0.02 + 0.01, jnp.float32)

    out = fp8_mixed_matmul(x, wq, ws, interpret=True)
    ref = (
        x.astype(jnp.float32)
        @ wq.astype(jnp.float32).T
    ) * ws[None, :]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=1e-3
    )

    xq = jnp.asarray(rng.randn(M, K), jnp.float8_e4m3fn)
    xs = jnp.asarray(rng.rand(M) * 0.1 + 0.05, jnp.float32)
    out = fp8_mixed_matmul(xq, wq, ws, xs, interpret=True)
    ref = (
        xq.astype(jnp.float32) @ wq.astype(jnp.float32).T
    ) * xs[:, None] * ws[None, :]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=1e-3
    )


def test_fp8_mixed_matmul_stacked_layer_idx():
    """Stacked [L, N, K] fp8 weights + traced layer_idx (the decode
    scan path) must match per-layer unstacked calls — per-row AND
    per-tensor weight scales."""
    from torchao_tpu.kernels.fp8_matmul import fp8_mixed_matmul

    rng = np.random.RandomState(4)
    L, M, N, K = 3, 2, 256, 512
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wq = jnp.asarray(rng.randn(L, N, K), jnp.float8_e4m3fn)
    for ws in (
        jnp.asarray(rng.rand(L, N) * 0.02 + 0.01, jnp.float32),
        jnp.asarray(rng.rand(L, 1) * 0.02 + 0.01, jnp.float32),
    ):
        for l in range(L):
            stacked = fp8_mixed_matmul(
                x, wq, ws, interpret=True, layer_idx=jnp.int32(l)
            )
            single = fp8_mixed_matmul(
                x, wq[l], ws[l], interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(stacked, np.float32),
                np.asarray(single, np.float32), rtol=0, atol=2e-6,
            )




class TestFp6Kernel:
    """Fused fp6 (e3m2) decode kernel — the reference fp6-LLM analog
    (csrc/cuda/fp6_llm/fp6_linear.cu); see kernels/fp6_matmul.py."""

    def _mk(self, N, K, seed=0):
        from torchao_tpu.kernels.fp6_matmul import pack_fp6_kmajor
        from torchao_tpu.quantization import quant_primitives as qp

        w = jax.random.normal(jax.random.PRNGKey(seed), (N, K), jnp.float32)
        scale = qp.choose_qparams_affine_floatx(w, 3, 2)
        codes = qp.exmy_encode(
            qp.quantize_affine_floatx(w, scale, 3, 2), 3, 2
        )
        s4, s2 = pack_fp6_kmajor(codes)
        return w, scale, codes, s4, s2

    def test_oracle_matches_primitives_exactly(self):
        """The K-major packed reconstruction is bit-exact vs
        exmy_decode + dequantize_affine_floatx (incl. subnormals)."""
        from torchao_tpu.quantization import quant_primitives as qp

        w, scale, codes, s4, s2 = self._mk(64, 512)
        f4 = jnp.concatenate([s4 & 0xF, s4 >> 4], axis=0)
        f2 = jnp.concatenate(
            [(s2 >> (2 * q)) & 3 for q in range(4)], axis=0
        )
        m = (f4 & 3).astype(jnp.float32)
        e = ((f4 >> 2) & 3).astype(jnp.int32) + (
            (f2 & 1).astype(jnp.int32) << 2
        )
        s = ((f2 >> 1) & 1).astype(jnp.float32)
        nz = (e > 0).astype(jnp.float32)
        v32 = (2 * m + (4 - m) * nz) * jnp.exp2(
            e.astype(jnp.float32)
        ) * (1 - 2 * s)
        wrec = (v32 / 32.0 * scale.astype(jnp.float32)[None, :]).T
        dq = qp.dequantize_affine_floatx(
            qp.exmy_decode(codes, 3, 2), scale, 3, 2,
            output_dtype=jnp.float32,
        )
        assert float(jnp.abs(wrec - dq).max()) == 0.0

    @pytest.mark.parametrize("bkq", [None, 256])
    def test_kernel_matches_oracle(self, bkq):
        from torchao_tpu.kernels.fp6_matmul import (
            fp6_dq_matmul,
            fp6_dq_matmul_reference,
        )

        w, scale, codes, s4, s2 = self._mk(256, 2048)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2048), jnp.bfloat16)
        ref = fp6_dq_matmul_reference(x, s4, s2, scale)
        out = fp6_dq_matmul(x, s4, s2, scale, interpret=True, bkq=bkq)
        rel = float(
            jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
            / jnp.abs(ref.astype(jnp.float32)).max()
        )
        assert rel < 1e-6, rel

    def test_stacked_layer_idx(self):
        from torchao_tpu.kernels.fp6_matmul import (
            fp6_dq_matmul,
            fp6_dq_matmul_reference,
        )

        mats = [self._mk(256, 2048, seed=i) for i in range(2)]
        s4s = jnp.stack([m[3] for m in mats])
        s2s = jnp.stack([m[4] for m in mats])
        scs = jnp.stack([m[1] for m in mats])
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 2048), jnp.bfloat16)
        for l in range(2):
            ref = fp6_dq_matmul_reference(x, mats[l][3], mats[l][4], mats[l][1])
            out = fp6_dq_matmul(
                x, s4s, s2s, scs, interpret=True, layer_idx=jnp.int32(l)
            )
            rel = float(
                jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32)
                ).max() / jnp.abs(ref.astype(jnp.float32)).max()
            )
            assert rel < 1e-6, (l, rel)

    def test_floatx_kmajor_dequant_matches_legacy(self):
        """kmajor FloatxArray dequantizes identically to the axis=-1
        shard layout (same codes, different storage)."""
        import os

        from torchao_tpu.qtypes.floatx import FloatxArray

        w = jax.random.normal(jax.random.PRNGKey(3), (64, 512), jnp.bfloat16)
        km = FloatxArray.from_hp(w, 3, 2)
        assert km.kmajor
        # legacy layout: force via a K not divisible by 8? use direct path
        from torchao_tpu.qtypes.packing import pack_uintx
        from torchao_tpu.quantization import quant_primitives as qp
        import dataclasses as dc

        scale = qp.choose_qparams_affine_floatx(w, 3, 2)
        codes = qp.exmy_encode(
            qp.quantize_affine_floatx(w, scale, 3, 2), 3, 2
        )
        shards = pack_uintx(codes, 6, axis=-1)
        legacy = dc.replace(
            km, qdata=shards[0], qdata2=shards[1], kmajor=False
        )
        np.testing.assert_array_equal(
            np.asarray(km.dequantize(jnp.float32)),
            np.asarray(legacy.dequantize(jnp.float32)),
        )

    def test_ops_linear_dispatch_and_slice_concat(self):
        from torchao_tpu import ops
        from torchao_tpu.qtypes.floatx import FloatxArray

        w = jax.random.normal(jax.random.PRNGKey(4), (256, 1024), jnp.bfloat16)
        qw = FloatxArray.from_hp(w, 3, 2)
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 1024), jnp.bfloat16)
        out = ops.linear(x, qw)
        ref = jnp.matmul(x, qw.dequantize(jnp.bfloat16).T)
        assert compute_error(ref, out) > 40
        # slice/concat round trip
        parts = [
            qw.slice_out_features(0, 128), qw.slice_out_features(128, 128)
        ]
        back = FloatxArray.concat_out_features(parts)
        np.testing.assert_array_equal(
            np.asarray(back.dequantize(jnp.float32)),
            np.asarray(qw.dequantize(jnp.float32)),
        )

    def test_dual_plane_exact_and_dispatch(self):
        """fp6 dual-plane serving form (FloatxArray.to_dual_planes):
        bit-exact dequant vs the packed 6-bit grid, and the stacked
        linear dispatch sums the two plane kernels."""
        from torchao_tpu import ops
        from torchao_tpu.qtypes.floatx import Fp6DualArray
        from torchao_tpu.quantization.quant_api import (
            FPXWeightOnlyConfig,
            quantize_,
        )

        w = jax.random.normal(
            jax.random.PRNGKey(6), (2, 128, 1024), jnp.bfloat16
        )
        packed = quantize_(
            {"w": w}, FPXWeightOnlyConfig(runtime="packed"),
            filter_fn=lambda p, l: True,
        )["w"]
        dual = quantize_(
            {"w": w}, FPXWeightOnlyConfig(),
            filter_fn=lambda p, l: True,
        )["w"]
        assert isinstance(dual, Fp6DualArray)
        np.testing.assert_array_equal(
            np.asarray(packed.dequantize(jnp.float32)),
            np.asarray(dual.dequantize(jnp.float32)),
        )
        # streamed bytes: 1.5/elem + scales (vs 2 for bf16-free int8x2)
        nbytes = dual.a_plane.qdata.size + dual.b_plane.qdata.size
        assert nbytes == 2 * 128 * 1024 * 3 // 2
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 1024), jnp.bfloat16)
        out = ops.linear(x, dual, layer_idx=jnp.int32(1))
        ref = jnp.matmul(x, dual.take_layer(1).dequantize(jnp.bfloat16).T)
        assert compute_error(ref, out) > 30


class TestFp6DualFused:
    """Round-4 single-launch dual-plane fp6 kernel
    (kernels/fp6_matmul.py::fp6_dual_matmul): exact vs the dequantized
    dual-plane oracle, stacked layer indexing."""

    def test_fused_dual_matches_dequant(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from torchao_tpu.kernels.fp6_matmul import fp6_dual_matmul
        from torchao_tpu.qtypes.floatx import FloatxArray

        key = jax.random.PRNGKey(0)
        N, K, L = 256, 2048, 3
        w = jax.random.normal(key, (L, N, K), jnp.float32)
        dual = FloatxArray.from_hp(w, ebits=3, mbits=2).to_dual_planes()
        x = jax.random.normal(key, (1, K), jnp.bfloat16)
        for l in (0, 2):
            ref = jnp.matmul(
                x.astype(jnp.float32),
                dual.take_layer(l).dequantize(jnp.float32).T,
            )
            out = fp6_dual_matmul(
                x, dual.a_plane.qdata, dual.b_plane.qdata,
                dual.a_plane.scale[..., :1, :],
                layer_idx=l, interpret=True,
            )
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            den = float(jnp.max(jnp.abs(ref))) + 1e-9
            assert err / den < 2e-2, (l, err / den)

    def test_dispatch_uses_fused(self):
        import jax
        import jax.numpy as jnp

        from torchao_tpu.kernels.fp6_matmul import (
            fp6_dual_matmul_available,
        )
        from torchao_tpu.qtypes.floatx import FloatxArray

        w = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 2048))
        dual = FloatxArray.from_hp(w, ebits=3, mbits=2).to_dual_planes()
        x = jnp.ones((1, 2048), jnp.bfloat16)
        assert fp6_dual_matmul_available(x, dual, layer_idx=0) is not None
        # prefill shapes (M > 16) decline the GEMV kernel
        xb = jnp.ones((32, 2048), jnp.bfloat16)
        assert fp6_dual_matmul_available(xb, dual, layer_idx=0) is None


class TestBatchedInt8MTiled:
    """Round-4 serving-knee fix: the chunked batched-int8 kernel m-tiles
    up to M=64 (8-row tiles reuse each streamed weight block), so B=32
    serving decode stays in the GEMV kernel class."""

    def test_m_tiled_exact(self):
        import jax
        import jax.numpy as jnp

        from torchao_tpu.kernels.int4_matmul import (
            int4_dq_matmul,
            int4_dq_matmul_reference,
        )

        G, K, N, L = 32, 2048, 256, 2
        kp, ng = K // 2, K // (2 * G)
        key = jax.random.PRNGKey(0)
        wp = jax.random.randint(
            key, (L, kp, N), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        s = (jax.random.uniform(key, (L, 2 * ng, N)) * 0.1 + 0.01).astype(
            jnp.bfloat16
        )
        z = (jax.random.normal(key, (L, 2 * ng, N)) * 0.05).astype(
            jnp.bfloat16
        )
        for M in (16, 32):
            x = jax.random.normal(
                jax.random.PRNGKey(M), (M, K), jnp.bfloat16
            )
            out = int4_dq_matmul(
                x, wp, s, z, group_size=G, variant="batched_int8",
                layer_idx=1, qparams_chunk=32, interpret=True,
            )
            ref = int4_dq_matmul_reference(
                x, wp[1], s[1], z[1], group_size=G
            )
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32)
            )))
            den = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            assert err / den < 2e-2, (M, err / den)
