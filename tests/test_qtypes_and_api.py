"""Tests for quantized array pytrees, qlinear dispatch and the quantize_
API — SQNR-gated linear correctness vs the dequantized-weight reference,
run both eager and jitted (mirroring the reference's
``TorchAOBasicTestCase``/``TorchAOCompileTestCase``,
``torchao/testing/utils.py:164,244``), plus config JSON round-trips
(``test/core/test_config.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.core.config import config_from_dict, config_to_dict
from torchao_tpu.qtypes import (
    Float8Array,
    IntxArray,
    PackingFormat,
    pack_int4,
    pack_uintx,
    unpack_int4,
    unpack_uintx,
)
from torchao_tpu.quantization import PerRow, PerTensor, PerGroup
from torchao_tpu.quantization.quant_api import (
    Float8DynamicActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    FPXWeightOnlyConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    IntxWeightOnlyConfig,
    ModuleFqnToConfig,
    UIntXWeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


def _w(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape), dtype
    )


class TestPacking:
    def test_int4_roundtrip(self):
        q = jnp.asarray(
            np.random.RandomState(0).randint(0, 16, (8, 64)), jnp.uint8
        )
        p = pack_int4(q)
        assert p.shape == (8, 32) and p.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(unpack_int4(p)), np.asarray(q))

    @pytest.mark.parametrize("nbits", [1, 2, 3, 4, 5, 6, 7])
    def test_uintx_roundtrip(self, nbits):
        n = 64
        q = jnp.asarray(
            np.random.RandomState(1).randint(0, 2**nbits, (4, n)), jnp.uint8
        )
        shards = pack_uintx(q, nbits)
        total_bytes = sum(s.size for s in shards)
        assert total_bytes == 4 * n * nbits / 8
        out = unpack_uintx(shards, nbits, n)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


class TestIntxArray:
    def test_pytree_roundtrip(self):
        w = _w((16, 64))
        qa = IntxArray.from_hp(
            w, __import__("torchao_tpu").quantization.MappingType.SYMMETRIC,
            (1, 64), "int8",
        )
        leaves, treedef = jax.tree_util.tree_flatten(qa)
        qa2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert qa2.block_size == qa.block_size
        np.testing.assert_array_equal(
            np.asarray(qa2.qdata), np.asarray(qa.qdata)
        )

    def test_tiled_nibbles_dequant_matches_plain(self):
        from torchao_tpu.quantization import MappingType, ZeroPointDomain

        w = _w((8, 128), seed=2, dtype=jnp.bfloat16)
        kwargs = dict(
            mapping_type=MappingType.ASYMMETRIC,
            block_size=(1, 32),
            target_dtype="uint4",
            quant_min=0,
            quant_max=15,
            eps=1e-6,
            zero_point_domain=ZeroPointDomain.FLOAT,
            preserve_zero=False,
        )
        plain = IntxArray.from_hp(w, packing_format=PackingFormat.PLAIN, **kwargs)
        tiled = IntxArray.from_hp(
            w, packing_format=PackingFormat.TILED_NIBBLES, **kwargs
        )
        assert tiled.qdata.shape == (64, 8)  # K-major: [K/2, N]
        np.testing.assert_array_equal(
            np.asarray(tiled.unpacked_qdata()), np.asarray(plain.qdata)
        )
        np.testing.assert_array_equal(
            np.asarray(tiled.dequantize(jnp.float32)),
            np.asarray(plain.dequantize(jnp.float32)),
        )


SQNR_BOUNDS = {
    "int4wo": 15,
    "int8wo": 35,
    "int8dq": 25,
    "fp8wo": 20,
    "fp8dq": 20,
    "8da4w": 15,
    "uintx": 15,
    "intx": 15,
    "fpx": 15,
}


def _linear_case(config, key):
    x = _w((4, 128), seed=10, dtype=jnp.bfloat16)
    w = _w((256, 128), seed=11, dtype=jnp.bfloat16)
    ref = jnp.matmul(x, w.T)
    qw = quantize_({"w": w}, config)["w"]
    assert not isinstance(qw, jnp.ndarray), f"{key}: weight not quantized"
    out = ops.linear(x, qw)
    assert out.shape == ref.shape
    err = compute_error(ref, out)
    assert err > SQNR_BOUNDS[key], f"{key}: SQNR {err} too low"
    # jitted path must agree with eager
    jout = jax.jit(lambda x, qw: ops.linear(x, qw))(x, qw)
    np.testing.assert_allclose(
        np.asarray(jout, np.float32), np.asarray(out, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    return err


class TestQuantizeApiLinear:
    def test_int4wo(self):
        _linear_case(Int4WeightOnlyConfig(group_size=32), "int4wo")

    def test_int4wo_hqq(self):
        _linear_case(Int4WeightOnlyConfig(group_size=32, use_hqq=True), "int4wo")

    def test_int8wo(self):
        _linear_case(Int8WeightOnlyConfig(), "int8wo")

    def test_int8dq(self):
        _linear_case(Int8DynamicActivationInt8WeightConfig(), "int8dq")

    def test_8da4w(self):
        _linear_case(Int8DynamicActivationInt4WeightConfig(group_size=32), "8da4w")

    def test_fp8wo(self):
        _linear_case(Float8WeightOnlyConfig(), "fp8wo")

    def test_fp8dq_per_row(self):
        _linear_case(
            Float8DynamicActivationFloat8WeightConfig(granularity=PerRow()),
            "fp8dq",
        )

    def test_fp8dq_per_tensor(self):
        _linear_case(
            Float8DynamicActivationFloat8WeightConfig(granularity=PerTensor()),
            "fp8dq",
        )

    def test_uintx(self):
        _linear_case(UIntXWeightOnlyConfig(dtype="uint4", group_size=32), "uintx")

    def test_intx(self):
        _linear_case(
            IntxWeightOnlyConfig(weight_dtype="int4", granularity=PerGroup(32)),
            "intx",
        )

    def test_fpx(self):
        _linear_case(FPXWeightOnlyConfig(ebits=3, mbits=2), "fpx")

    def test_filter_fn(self):
        params = {"a": {"w": _w((8, 16))}, "b": {"w": _w((8, 16))}}
        out = quantize_(
            params, Int8WeightOnlyConfig(),
            filter_fn=lambda path, leaf: path.startswith("a"),
        )
        assert isinstance(out["a"]["w"], IntxArray)
        assert isinstance(out["b"]["w"], jnp.ndarray)

    def test_module_fqn_to_config(self):
        params = {
            "attn": {"wq": _w((8, 32))},
            "mlp": {"w1": _w((8, 32))},
            "head": {"w": _w((8, 32))},
        }
        cfg = ModuleFqnToConfig(
            {
                "attn.*": Int8WeightOnlyConfig(),
                "_default": Int4WeightOnlyConfig(group_size=32),
            }
        )
        out = quantize_(params, cfg)
        assert out["attn"]["wq"].target_dtype == "int8"
        assert out["mlp"]["w1"].target_dtype == "uint4"
        assert out["head"]["w"].target_dtype == "uint4"

    def test_small_weight_skipped_int8dq(self):
        params = {"w": _w((8, 16))}
        out = quantize_(params, Int8DynamicActivationInt8WeightConfig())
        assert isinstance(out["w"], jnp.ndarray)  # in_features <= 16 skip


class TestConfigSerialization:
    @pytest.mark.parametrize(
        "cfg",
        [
            Int4WeightOnlyConfig(group_size=64),
            Int8WeightOnlyConfig(),
            Int8DynamicActivationInt8WeightConfig(weight_only_decode=True),
            Float8WeightOnlyConfig(),
            Float8DynamicActivationFloat8WeightConfig(granularity=PerRow()),
            FPXWeightOnlyConfig(ebits=2, mbits=2),
        ],
    )
    def test_json_roundtrip(self, cfg):
        d = config_to_dict(cfg)
        import json

        s = json.dumps(d)  # must be JSON-serializable
        cfg2 = config_from_dict(json.loads(s))
        assert type(cfg2) is type(cfg)
        assert cfg2 == cfg

    def test_module_fqn_roundtrip(self):
        cfg = ModuleFqnToConfig(
            {"layers.*": Int8WeightOnlyConfig(), "_default": None}
        )
        cfg2 = config_from_dict(config_to_dict(cfg))
        assert type(cfg2.module_fqn_to_config["layers.*"]) is Int8WeightOnlyConfig


class TestShardability:
    def test_quantized_pytree_shards_over_mesh(self):
        """Quantized arrays are pytrees → NamedSharding applies per-leaf.
        Rowwise scale shards with rows (SURVEY.md §2.10 TP rules)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        assert len(devs) == 8, devs
        mesh = Mesh(np.array(devs).reshape(2, 4), ("data", "model"))
        w = _w((256, 128), dtype=jnp.bfloat16)
        qw = quantize_({"w": w}, Int8WeightOnlyConfig())["w"]
        shardings = IntxArray(
            qdata=NamedSharding(mesh, P("model", None)),
            scale=NamedSharding(mesh, P("model")),
            zero_point=NamedSharding(mesh, P("model")),
            block_size=qw.block_size,
            target_dtype=qw.target_dtype,
            quant_min=qw.quant_min,
            quant_max=qw.quant_max,
            zero_point_domain=qw.zero_point_domain,
            packing_format=qw.packing_format,
            logical_shape=qw.logical_shape,
            activation_dtype=qw.activation_dtype,
        )
        qw_sharded = jax.device_put(qw, shardings)
        x = _w((4, 128), dtype=jnp.bfloat16)
        out = jax.jit(lambda x, qw: ops.linear(x, qw))(x, qw_sharded)
        ref = ops.linear(x, qw)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=1e-2, atol=1e-2,
        )


class TestNF4:
    def test_roundtrip_and_linear(self):
        from torchao_tpu.qtypes import NF4Array, linear_nf4, to_nf4

        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(64, 128), jnp.bfloat16)
        nf4 = to_nf4(w, block_size=64, scaler_block_size=64)
        dq = nf4.dequantize(jnp.float32)
        assert dq.shape == (64, 128)
        err = compute_error(w.astype(jnp.float32), dq)
        assert err > 12, err  # ~4-bit fidelity

        x = jnp.asarray(rs.randn(4, 128), jnp.bfloat16)
        out = linear_nf4(x, nf4)
        ref = jnp.matmul(x, w.T)
        assert compute_error(ref, out) > 10

        # double-quantized scaler storage really is int8
        assert nf4.quantized_scalers.dtype == jnp.int8
        # memory: codes are 2/byte
        assert nf4.qdata.size == w.size // 2

    def test_nf4_dispatch_fallback(self):
        """ops.linear uses the generic dequant fallback for NF4."""
        from torchao_tpu import ops
        from torchao_tpu.qtypes import to_nf4

        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(32, 64), jnp.bfloat16)
        nf4 = to_nf4(w, block_size=32, scaler_block_size=32)
        x = jnp.asarray(rs.randn(2, 64), jnp.bfloat16)
        out = ops.linear(x, nf4)
        assert compute_error(jnp.matmul(x, w.T), out) > 10


class TestBitShards:
    @pytest.mark.parametrize("nbits", [2, 3, 5, 6, 7])
    def test_sub_byte_storage_and_fidelity(self, nbits):
        from torchao_tpu.qtypes.base import PackingFormat as PF

        w = _w((32, 64), seed=nbits, dtype=jnp.bfloat16)
        qw = quantize_(
            {"w": w}, UIntXWeightOnlyConfig(dtype=f"uint{nbits}", group_size=32)
        )["w"]
        assert qw.packing_format is PF.BIT_SHARDS
        # true sub-byte storage: nbits/8 bytes per element
        assert qw.qdata.size == 32 * 64 * nbits // 8
        x = _w((4, 64), seed=20, dtype=jnp.bfloat16)
        ref = jnp.matmul(x, w.T)
        out = ops.linear(x, qw)
        # fidelity scales with bits; 2-bit is crude
        bound = {2: 3, 3: 8, 5: 18, 6: 24, 7: 30}[nbits]
        assert compute_error(ref, out) > bound

    def test_stacked_take_layer(self):
        """BIT_SHARDS qdata keeps leading axes ([..., N, Σ K·bits/8]) so
        stacked per-layer weights are layer-sliceable (take_layer under
        the model's lax.scan — broke when shards were flattened 1-D)."""
        import numpy as np

        w = _w((2, 32, 64), seed=3, dtype=jnp.bfloat16)
        qw = quantize_(
            {"w": w}, UIntXWeightOnlyConfig(dtype="uint3", group_size=32),
            filter_fn=lambda p, l: True,
        )["w"]
        assert qw.qdata.shape[:2] == (2, 32)
        full = np.asarray(qw.dequantize(jnp.float32))
        for l in range(2):
            sl = np.asarray(qw.take_layer(l).dequantize(jnp.float32))
            assert np.array_equal(full[l], sl)


class TestSliceForServing:
    """The reference's vLLM weight-loading pattern
    (`_test_slice_and_copy_similar_to_vllm`, torchao/testing/utils.py:428):
    a quantized weight must slice along out-features with qparams staying
    consistent — needed for manual TP sharding and serving loaders."""

    @pytest.mark.parametrize("fmt", ["plain", "tiled"])
    def test_slice_matches_dequant_slice(self, fmt):
        from torchao_tpu.qtypes.base import PackingFormat as PF

        w = _w((256, 128), seed=42, dtype=jnp.bfloat16)
        cfg = Int4WeightOnlyConfig(
            group_size=32,
            packing_format=PF.TILED_NIBBLES if fmt == "tiled" else PF.PLAIN,
        )
        qw = quantize_({"w": w}, cfg)["w"]
        half = qw.slice_out_features(64, 128)
        assert half.shape == (128, 128)
        np.testing.assert_array_equal(
            np.asarray(half.dequantize(jnp.float32)),
            np.asarray(qw.dequantize(jnp.float32))[64:192],
        )
        # sliced shard still runs through dispatch
        x = _w((2, 128), seed=43, dtype=jnp.bfloat16)
        out = ops.linear(x, half)
        full = ops.linear(x, qw)
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(full, np.float32)[:, 64:192],
            rtol=2e-2, atol=2e-2,
        )

    def test_slice_int8(self):
        w = _w((64, 32), seed=44, dtype=jnp.bfloat16)
        qw = quantize_({"w": w}, Int8WeightOnlyConfig())["w"]
        part = qw.slice_out_features(0, 16)
        np.testing.assert_array_equal(
            np.asarray(part.dequantize(jnp.float32)),
            np.asarray(qw.dequantize(jnp.float32))[:16],
        )


class TestExternalKernelParityConfigs:
    """Gemlite / Fbgemm / f8i4 config names (reference quant_api.py:935,
    2145, 1161) mapped onto the TPU-native paths."""

    def _toy(self):
        return jnp.asarray(
            np.random.RandomState(0).randn(256, 256), jnp.float32
        )

    def test_gemlite_4bit(self):
        from torchao_tpu.quantization.quant_api import (
            GemliteUIntXWeightOnlyConfig, quantize_,
        )

        p = quantize_({"w": self._toy()}, GemliteUIntXWeightOnlyConfig())
        x = jnp.asarray(np.random.RandomState(1).randn(2, 256), jnp.float32)
        out = ops.linear(x, p["w"])
        ref = jnp.matmul(x, p["w"].dequantize(jnp.float32).T)
        assert compute_error(ref, out) > 25

    def test_gemlite_8bit_dynamic(self):
        from torchao_tpu.qtypes.composition import (
            LinearActivationQuantizedArray,
        )
        from torchao_tpu.quantization.quant_api import (
            GemliteUIntXWeightOnlyConfig, quantize_,
        )

        p = quantize_(
            {"w": self._toy()},
            GemliteUIntXWeightOnlyConfig(bit_width=8, mode="dynamic"),
        )
        assert isinstance(p["w"], LinearActivationQuantizedArray)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 256), jnp.float32)
        out = ops.linear(x, p["w"])
        assert np.isfinite(np.asarray(out)).all()

    def test_f8i4(self):
        from torchao_tpu.qtypes.composition import (
            LinearActivationQuantizedArray,
        )
        from torchao_tpu.quantization.quant_api import (
            Float8DynamicActivationInt4WeightConfig, quantize_,
        )

        p = quantize_(
            {"w": self._toy()},
            Float8DynamicActivationInt4WeightConfig(group_size=64),
        )
        assert isinstance(p["w"], LinearActivationQuantizedArray)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 256), jnp.float32)
        out = ops.linear(x, p["w"])
        wd = p["w"].dequantize(jnp.float32)
        ref = jnp.matmul(x, wd.T)
        assert compute_error(ref, out) > 15  # fp8-act QDQ noise on top

    @pytest.mark.parametrize(
        "triple",
        [
            ("bfloat16", "int4", "bfloat16"),
            ("float8_e4m3fn", "int4", "bfloat16"),
            ("float8_e4m3fn", "float8_e4m3fn", "bfloat16"),
        ],
    )
    def test_fbgemm_triples(self, triple):
        from torchao_tpu.quantization.quant_api import (
            FbgemmConfig, quantize_,
        )

        cfg = FbgemmConfig(
            input_dtype=triple[0], weight_dtype=triple[1],
            output_dtype=triple[2],
        )
        p = quantize_({"w": self._toy()}, cfg)
        x = jnp.asarray(np.random.RandomState(4).randn(2, 256), jnp.float32)
        out = ops.linear(x, p["w"])
        assert np.isfinite(np.asarray(out)).all()

    def test_fbgemm_unsupported_triple_raises(self):
        from torchao_tpu.quantization.quant_api import (
            FbgemmConfig, quantize_,
        )

        with pytest.raises(NotImplementedError):
            quantize_(
                {"w": self._toy()},
                FbgemmConfig(weight_dtype="int2"),
            )

    def test_config_json_roundtrip(self):
        from torchao_tpu.core.config import config_from_dict, config_to_dict
        from torchao_tpu.quantization.quant_api import (
            FbgemmConfig,
            Float8DynamicActivationInt4WeightConfig,
            GemliteUIntXWeightOnlyConfig,
        )

        for cfg in (
            GemliteUIntXWeightOnlyConfig(bit_width=8),
            FbgemmConfig(),
            Float8DynamicActivationInt4WeightConfig(group_size=64),
        ):
            rt = config_from_dict(config_to_dict(cfg))
            assert rt == cfg


def test_int4_xla_min_m_threshold(monkeypatch):
    """Prefill-class rows take the XLA dequant+matmul path; both sides
    of the threshold agree numerically (ops/qlinear._int4_xla_min_m)."""
    import numpy as np

    from torchao_tpu import ops
    from torchao_tpu.ops.qlinear import _int4_xla_min_m
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    monkeypatch.delenv("TORCHAO_TPU_INT4_XLA_MIN_M", raising=False)
    assert _int4_xla_min_m() == 4096
    monkeypatch.setenv("TORCHAO_TPU_INT4_XLA_MIN_M", "0")
    assert _int4_xla_min_m() == 0
    monkeypatch.setenv("TORCHAO_TPU_INT4_XLA_MIN_M", "256")
    assert _int4_xla_min_m() == 256

    rng = np.random.RandomState(11)
    hp = {"w": jnp.asarray(rng.randn(256, 2048) * 0.05, jnp.float32)}
    qw = quantize_(hp, Int4WeightOnlyConfig(group_size=32))["w"]
    x = jnp.asarray(rng.randn(512, 2048) * 0.1, jnp.bfloat16)  # M >= 256
    out_thresh = ops.linear(x, qw)
    monkeypatch.setenv("TORCHAO_TPU_INT4_XLA_MIN_M", "0")
    out_off = ops.linear(x, qw)
    np.testing.assert_allclose(
        np.asarray(out_thresh, np.float32),
        np.asarray(out_off, np.float32),
        rtol=0.05, atol=0.05,
    )
