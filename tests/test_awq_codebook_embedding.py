"""AWQ, codebook quantization, and quantized-embedding tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.prototype.awq import (
    AWQConfig,
    convert_awq_,
    insert_awq_observers_,
)
from torchao_tpu.prototype.codebook import (
    CodebookQuantizedArray,
    CodebookWeightOnlyConfig,
)
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


class TestAWQ:
    def test_awq_beats_rtn_on_outliers(self):
        rs = np.random.RandomState(0)
        K, N = 256, 128
        w = jnp.asarray(rs.randn(N, K), jnp.float32)
        chan = np.ones(K); chan[:16] = 30.0
        xs = [jnp.asarray(rs.randn(8, K) * chan, jnp.float32) for _ in range(3)]

        observed, stats = insert_awq_observers_({"w": w})
        for x in xs:
            ops.linear(x, observed["w"])
        base = Int4WeightOnlyConfig(group_size=64)
        awq = convert_awq_(observed, AWQConfig(base_config=base))

        rtn = quantize_({"w": w}, base)

        xt = jnp.asarray(rs.randn(16, K) * chan, jnp.float32)
        ref = jnp.matmul(xt, w.T)
        err_awq = compute_error(ref, ops.linear(xt, awq["w"]))
        err_rtn = compute_error(ref, ops.linear(xt, rtn["w"]))
        assert err_awq > err_rtn, (err_awq, err_rtn)


class TestCodebook:
    def test_roundtrip_and_linear(self):
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(64, 128), jnp.bfloat16)
        qw = quantize_({"w": w}, CodebookWeightOnlyConfig(dtype_nbits=4))["w"]
        assert isinstance(qw, CodebookQuantizedArray)
        assert qw.indices.dtype == jnp.uint8
        assert qw.codebook.shape == (16,)
        err = compute_error(w, qw.dequantize(jnp.float32))
        assert err > 15
        x = jnp.asarray(rs.randn(4, 128), jnp.bfloat16)
        out = ops.linear(x, qw)  # generic dequant fallback
        ref = jnp.matmul(x, w.T)
        assert compute_error(ref, out) > 13


class TestQuantizedEmbedding:
    def test_int8_embedding_lookup(self):
        rs = np.random.RandomState(2)
        table = jnp.asarray(rs.randn(512, 64), jnp.float32)
        q = quantize_({"e": table}, Int8WeightOnlyConfig())["e"]
        ids = jnp.asarray(rs.randint(0, 512, (2, 7)), jnp.int32)
        out = ops.embedding(q, ids)
        ref = table[ids]
        assert out.shape == ref.shape
        assert compute_error(ref, out) > 35

    def test_model_with_quantized_embedding(self):
        from torchao_tpu.models.llama.model import Transformer

        model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        toks = jnp.asarray(
            np.random.RandomState(3).randint(0, 512, (1, 8)), jnp.int32
        )
        ref, _ = model(params, toks)
        # embed-int8wo recipe: quantize only the embedding table
        qparams = quantize_(
            params, Int8WeightOnlyConfig(),
            filter_fn=lambda p, l: "tok_embeddings" in p,
        )
        assert not isinstance(qparams["tok_embeddings"]["weight"], jnp.ndarray)
        out, _ = model(qparams, toks)
        assert compute_error(ref, out) > 30


class TestCodebookVariants:
    """The reference ships THREE codebook variants
    (prototype/quantization/codebook{,_coreml,_groupwise}); these cover
    the other two: block (vector) codebooks and groupwise LUTs."""

    def test_block_codebook_roundtrip_and_bits(self):
        from torchao_tpu.prototype.codebook import (
            BlockCodebookQuantizedArray,
            BlockCodebookWeightOnlyConfig,
        )

        rs = np.random.RandomState(3)
        w = jnp.asarray(rs.randn(64, 128), jnp.bfloat16)
        qw = quantize_(
            {"w": w},
            BlockCodebookWeightOnlyConfig(dtype_nbits=8, block_len=2),
        )["w"]
        assert isinstance(qw, BlockCodebookQuantizedArray)
        # 8 bits per 2-weight code = 4 bits/weight
        assert qw.indices.shape == (64, 64)
        assert qw.codebook.shape == (256, 2)
        err = compute_error(w, qw.dequantize(jnp.float32))
        assert err > 12, err
        x = jnp.asarray(rs.randn(4, 128), jnp.bfloat16)
        assert compute_error(
            jnp.matmul(x, w.T), ops.linear(x, qw)
        ) > 10

    def test_groupwise_lut_beats_single_lut_on_heterogeneous_rows(self):
        from torchao_tpu.prototype.codebook import (
            GroupwiseLutQuantizedArray,
            GroupwiseLutWeightConfig,
        )

        rs = np.random.RandomState(4)
        # two row populations with different shapes (uniform vs bimodal):
        # a single global LUT must compromise; per-group LUTs adapt
        a = rs.uniform(-1, 1, (32, 128))
        b = rs.choice([-1.0, -0.9, 0.9, 1.0], (32, 128)) + rs.randn(32, 128) * 0.02
        w = jnp.asarray(np.concatenate([a, b]), jnp.float32)
        qg = quantize_(
            {"w": w},
            GroupwiseLutWeightConfig(dtype_nbits=3, rows_per_group=32),
        )["w"]
        assert isinstance(qg, GroupwiseLutQuantizedArray)
        assert qg.luts.shape == (2, 8)
        qs = quantize_(
            {"w": w}, CodebookWeightOnlyConfig(dtype_nbits=3)
        )["w"]
        err_g = compute_error(w, qg.dequantize(jnp.float32))
        err_s = compute_error(w, qs.dequantize(jnp.float32))
        assert err_g > err_s + 1.0, (err_g, err_s)
