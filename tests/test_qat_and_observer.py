"""QAT (prepare/convert, STE gradients) and observer (static PTQ) tests.

Mirrors the reference's ``test/quantization/test_qat.py`` strategy: fake
quant numerics match PTQ quant-dequant; gradients flow through prepared
weights; convert produces real quantized arrays.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.quantization.observer import (
    MinMaxObserverState,
    ObserverConfig,
    minmax_calculate_qparams,
    minmax_update,
)
from torchao_tpu.quantization.granularity import PerAxis
from torchao_tpu.quantization.qat import (
    IntxFakeQuantizeConfig,
    QATConfig,
    QATFakeQuantizedArray,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    quantize_,
)
from torchao_tpu.quantization.quant_primitives import MappingType
from torchao_tpu.utils import compute_error


def _w(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


class TestQAT:
    def test_prepare_wraps_and_matches_ptq_numerics(self):
        w = _w((64, 128), dtype=jnp.bfloat16)
        x = _w((4, 128), seed=1, dtype=jnp.bfloat16)
        base = Int4WeightOnlyConfig(group_size=32)
        prepared = quantize_(
            {"w": w}, QATConfig(base_config=base, step="prepare")
        )["w"]
        assert isinstance(prepared, QATFakeQuantizedArray)
        qat_out = ops.linear(x, prepared)

        # PTQ quant-dequant of the same weight gives the same fake weight
        ptq = quantize_({"w": w}, base)["w"]
        ptq_out = ops.linear(x, ptq)
        err = compute_error(ptq_out, qat_out)
        assert err > 30, f"QAT fake-quant != PTQ numerics: {err}"

    def test_gradients_flow_with_ste(self):
        w = _w((32, 64))
        x = _w((8, 64), seed=2)
        prepared = quantize_(
            {"w": w},
            QATConfig(
                base_config=Int8DynamicActivationInt4WeightConfig(
                    group_size=32
                ),
                step="prepare",
            ),
        )

        def loss(p):
            return jnp.sum(ops.linear(x, p["w"]) ** 2)

        g = jax.grad(loss)(prepared)
        gw = g["w"].weight
        assert gw.shape == w.shape
        assert float(jnp.max(jnp.abs(gw))) > 0, "zero grads — STE broken"
        assert bool(jnp.all(jnp.isfinite(gw)))

    def test_convert_produces_real_quantized(self):
        from torchao_tpu.qtypes import IntxArray

        w = _w((64, 128), dtype=jnp.bfloat16)
        base = Int4WeightOnlyConfig(group_size=32)
        prepared = quantize_(
            {"w": w}, QATConfig(base_config=base, step="prepare")
        )
        converted = quantize_(
            prepared, QATConfig(base_config=base, step="convert")
        )
        assert isinstance(converted["w"], IntxArray)
        # converting the trained hp weight == directly PTQ-ing it
        direct = quantize_({"w": w}, base)["w"]
        np.testing.assert_array_equal(
            np.asarray(converted["w"].qdata), np.asarray(direct.qdata)
        )

    def test_explicit_fq_configs(self):
        w = _w((32, 64), dtype=jnp.bfloat16)
        x = _w((4, 64), seed=3, dtype=jnp.bfloat16)
        prepared = quantize_(
            {"w": w},
            QATConfig(
                activation_config=IntxFakeQuantizeConfig(
                    dtype="int8", is_symmetric=True
                ),
                weight_config=IntxFakeQuantizeConfig(
                    dtype="int4", group_size=32
                ),
                step="prepare",
            ),
        )["w"]
        out = ops.linear(x, prepared)
        ref = jnp.matmul(x, w.T)
        assert compute_error(ref, out) > 10


class TestObserver:
    def test_minmax_running_stats(self):
        cfg = ObserverConfig(
            mapping_type=MappingType.ASYMMETRIC,
            target_dtype="int8",
            granularity=PerAxis(0),
        )
        state = MinMaxObserverState()
        batches = [_w((16, 32), seed=s) for s in range(4)]
        for b in batches:
            state = minmax_update(state, b, cfg)
        allx = jnp.concatenate(batches, axis=1)
        np.testing.assert_allclose(
            np.asarray(state.min_val),
            np.asarray(jnp.min(allx, axis=1)),
            rtol=1e-6,
        )
        scale, zp = minmax_calculate_qparams(state, cfg)
        assert scale.shape == (16,)
        assert bool(jnp.all(scale > 0))

    def test_static_quant_flow(self):
        """Observer stats → qparams → quantize_affine: the static-quant
        calibration loop (reference insert_observers_ flow)."""
        from torchao_tpu.quantization import quant_primitives as qp

        cfg = ObserverConfig(
            mapping_type=MappingType.SYMMETRIC,
            target_dtype="int8",
            granularity=PerAxis(0),
        )
        state = MinMaxObserverState()
        data = _w((8, 64), seed=7)
        state = minmax_update(state, data, cfg)
        scale, zp = minmax_calculate_qparams(state, cfg)
        q = qp.quantize_affine(
            data, (1, 64), scale, zp.astype(jnp.int32), "int8"
        )
        dq = qp.dequantize_affine(q, (1, 64), scale, zp)
        assert compute_error(data, dq) > 30


class TestMSEObserver:
    def test_mse_beats_minmax_at_int4(self):
        """MSE-clipped qparams beat raw min/max at low bit width on
        outlier-heavy data (at int8 the 256 levels make min/max near
        optimal — the win appears at int4)."""
        from torchao_tpu.quantization import quant_primitives as qp
        from torchao_tpu.quantization.observer import (
            MSEObserverState,
            mse_calculate_qparams,
            mse_update,
        )

        cfg = ObserverConfig(
            mapping_type=MappingType.SYMMETRIC,
            target_dtype="int4",
            granularity=None,
        )
        rs = np.random.RandomState(0)
        data = np.concatenate(
            [rs.randn(4000), rs.randn(96) * 8]
        ).astype(np.float32)
        x = jnp.asarray(data)

        mm = MinMaxObserverState()
        mm = minmax_update(mm, x, cfg)
        s_mm, z_mm = minmax_calculate_qparams(mm, cfg)

        ms = MSEObserverState(steps=30)
        ms = mse_update(ms, x, cfg)
        s_ms, z_ms = mse_calculate_qparams(ms, cfg)

        def mse_of(s, z):
            q = qp.quantize_affine(
                x, (x.size,), s, z.astype(jnp.int32), "int4"
            )
            dq = qp.dequantize_affine(q, (x.size,), s, z)
            return float(jnp.mean((dq - x) ** 2))

        assert mse_of(s_ms, z_ms) < mse_of(s_mm, z_mm) * 0.8


class TestEmbeddingQAT:
    def test_fake_quant_embedding_gradients(self):
        from torchao_tpu import ops
        from torchao_tpu.quantization.qat import (
            IntxFakeQuantizeConfig,
            QATConfig,
        )
        from torchao_tpu.quantization.quant_api import quantize_

        table = jnp.asarray(
            np.random.RandomState(0).randn(64, 16), jnp.float32
        )
        prepared = quantize_(
            {"emb": table},
            QATConfig(
                weight_config=IntxFakeQuantizeConfig(dtype="int4",
                                                     group_size=16),
                step="prepare",
            ),
            filter_fn=lambda p, l: True,
        )
        ids = jnp.asarray([1, 5, 9], jnp.int32)

        def loss(p):
            return jnp.sum(ops.embedding(p["emb"], ids) ** 2)

        out = ops.embedding(prepared["emb"], ids)
        assert out.shape == (3, 16)
        g = jax.grad(loss)(prepared)["emb"].weight
        # only looked-up rows get gradient
        gn = np.linalg.norm(np.asarray(g), axis=1)
        assert (gn[np.asarray(ids)] > 0).all()
        assert gn[0] == 0

    def test_embedding_qat_convert_to_quantized_table(self):
        """prepare → train → convert: the deployed table is a PLAIN
        IntxArray whose row-gather matches the fake-quant numerics
        (reference qat/embedding.py convert path)."""
        import optax

        from torchao_tpu import ops
        from torchao_tpu.qtypes.base import PackingFormat
        from torchao_tpu.qtypes.intx import IntxArray
        from torchao_tpu.quantization.qat import QATConfig
        from torchao_tpu.quantization.quant_api import (
            IntxWeightOnlyConfig,
            PerGroup,
            quantize_,
        )

        base = IntxWeightOnlyConfig("int4", PerGroup(16))
        table = jnp.asarray(
            np.random.RandomState(1).randn(64, 32), jnp.float32
        )
        prepared = quantize_(
            {"emb": table}, QATConfig(base, step="prepare"),
            filter_fn=lambda p, l: True,
        )
        ids = jnp.asarray([2, 7, 11, 13], jnp.int32)
        tgt = jnp.asarray(np.random.RandomState(2).randn(4, 32),
                          jnp.float32)

        def loss(p):
            return jnp.mean((ops.embedding(p["emb"], ids) - tgt) ** 2)

        opt = optax.sgd(0.5)
        state = opt.init(prepared)
        l0 = float(loss(prepared))
        for _ in range(50):
            grads = jax.grad(loss)(prepared)
            upd, state = opt.update(grads, state)
            prepared = optax.apply_updates(prepared, upd)
        assert float(loss(prepared)) < l0 * 0.5  # QAT actually trains

        converted = quantize_(
            prepared, QATConfig(base, step="convert"),
            filter_fn=lambda p, l: True,
        )
        q = converted["emb"]
        assert isinstance(q, IntxArray)
        assert q.packing_format is PackingFormat.PLAIN
        # converted lookup ≈ final fake-quant lookup (same numerics)
        fq = np.asarray(ops.embedding(prepared["emb"], ids))
        real = np.asarray(ops.embedding(q, ids))
        np.testing.assert_allclose(real, fq, rtol=1e-4, atol=1e-4)
