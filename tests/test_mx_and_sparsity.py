"""MX format and sparsity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.prototype.mx_formats import (
    MXFPInferenceConfig,
    NVFP4InferenceConfig,
)
from torchao_tpu.prototype.mx_formats.mx_tensor import (
    MXArray,
    to_mx,
    to_nvfp4,
)
from torchao_tpu.quantization.quant_api import quantize_
from torchao_tpu.sparsity import (
    SemiSparseWeightConfig,
    BlockSparseWeightConfig,
    WandaSparsifier,
    sparsify_,
)
from torchao_tpu.sparsity.sparse_api import semi_sparse_mask_2_4
from torchao_tpu.utils import compute_error


def _w(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


class TestMX:
    @pytest.mark.parametrize(
        "elem,bound",
        [
            ("fp8_e4m3", 28),
            ("fp8_e5m2", 20),
            ("fp6_e3m2", 16),
            ("fp6_e2m3", 18),
            ("fp4_e2m1", 8),
        ],
    )
    def test_roundtrip_sqnr(self, elem, bound):
        x = _w((16, 256), seed=1)
        mx = to_mx(x, elem)
        dq = mx.dequantize(jnp.float32)
        err = compute_error(x, dq)
        assert err > bound, f"{elem}: {err}"

    def test_scale_is_pow2(self):
        x = _w((4, 64))
        mx = to_mx(x, "fp8_e4m3")
        assert mx.scale_exp.dtype == jnp.uint8
        assert mx.scale_exp.shape == (4, 2)

    def test_quantize_api_and_linear(self):
        w = _w((64, 128), dtype=jnp.bfloat16)
        x = _w((4, 128), seed=2, dtype=jnp.bfloat16)
        qw = quantize_({"w": w}, MXFPInferenceConfig())["w"]
        assert isinstance(qw, MXArray)
        ref = jnp.matmul(x, w.T)
        out = ops.linear(x, qw)
        assert compute_error(ref, out) > 20

    def test_nvfp4(self):
        w = _w((64, 128), dtype=jnp.bfloat16)
        x = _w((4, 128), seed=3, dtype=jnp.bfloat16)
        qw = quantize_({"w": w}, NVFP4InferenceConfig())["w"]
        ref = jnp.matmul(x, w.T)
        out = ops.linear(x, qw)
        assert compute_error(ref, out) > 8


class TestSparsity:
    def test_2_4_mask_structure(self):
        w = _w((8, 64))
        mask = semi_sparse_mask_2_4(w)
        per_group = np.asarray(mask).reshape(8, 16, 4).sum(-1)
        np.testing.assert_array_equal(per_group, 2)
        # kept entries are the 2 largest |w| per group
        aw = np.abs(np.asarray(w)).reshape(8, 16, 4)
        kept = np.where(np.asarray(mask).reshape(8, 16, 4), aw, -1)
        dropped = np.where(~np.asarray(mask).reshape(8, 16, 4), aw, 1e9)
        assert (kept.max(-1) >= dropped.min(-1) - 1e-7).all()

    def test_sparsify_then_quantize_composition(self):
        from torchao_tpu.quantization.quant_api import (
            Int8DynamicActivationInt8WeightConfig,
        )

        w = _w((64, 128), dtype=jnp.bfloat16)
        sparse = sparsify_({"w": w}, SemiSparseWeightConfig())
        frac = float(jnp.mean((sparse["w"] == 0).astype(jnp.float32)))
        assert 0.45 < frac < 0.55
        q = quantize_(sparse, Int8DynamicActivationInt8WeightConfig())
        x = _w((4, 128), seed=5, dtype=jnp.bfloat16)
        out = ops.linear(x, q["w"])
        ref = jnp.matmul(x, sparse["w"].T)
        assert compute_error(ref, out) > 20

    def test_block_sparse(self):
        w = _w((128, 128))
        out = sparsify_({"w": w}, BlockSparseWeightConfig(
            blocksize=32, target_sparsity=0.75
        ))["w"]
        blocks = np.asarray(out).reshape(4, 32, 4, 32)
        zero_blocks = (np.abs(blocks).sum((1, 3)) == 0).sum()
        assert zero_blocks == 12  # 75% of 16

    def test_wanda(self):
        w = _w((16, 64))
        act_norm = jnp.abs(_w((64,), seed=7)) + 0.1
        ws = WandaSparsifier(sparsity_level=0.5)
        pruned = ws.prune(w, act_norm)
        frac = float(jnp.mean((pruned == 0).astype(jnp.float32)))
        assert 0.4 < frac < 0.6
        ws24 = WandaSparsifier(semi_structured_block_size=4)
        mask = ws24.compute_mask(w, act_norm)
        np.testing.assert_array_equal(
            np.asarray(mask).reshape(16, 16, 4).sum(-1), 2
        )


class TestSupermask:
    def test_mask_and_ste(self):
        from torchao_tpu import ops
        from torchao_tpu.sparsity.supermask import (
            SupermaskWeight,
            to_supermask,
        )

        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(16, 32), jnp.float32)
        sm = to_supermask(w, sparsity=0.5)
        mw = sm.masked_weight()
        frac = float(jnp.mean((mw == 0).astype(jnp.float32)))
        assert 0.45 < frac < 0.55
        # kept entries are the largest-|w| ones (scores init = |w|)
        assert float(jnp.min(jnp.abs(mw[mw != 0]))) >= float(
            jnp.max(jnp.abs(w * (mw == 0)))
        ) - 1e-5

        x = jnp.asarray(rs.randn(4, 32), jnp.float32)

        def loss(sm):
            return jnp.sum(ops.linear(x, sm) ** 2)

        g = jax.grad(loss)(sm)
        assert float(jnp.linalg.norm(g.scores)) > 0  # STE to scores
        # weight grads masked
        mask = np.asarray(mw != 0)
        gw = np.asarray(g.weight)
        assert (gw[~mask] == 0).all()

    def test_learned_mask_improves(self):
        """Training scores (weights frozen) finds a better mask than
        magnitude init when importance is activation-dependent."""
        from torchao_tpu import ops
        from torchao_tpu.sparsity.supermask import to_supermask
        import dataclasses

        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(8, 64), jnp.float32)
        # only first 16 input dims carry signal
        x = jnp.asarray(
            np.concatenate(
                [rs.randn(128, 16), np.zeros((128, 48))], axis=1
            ),
            jnp.float32,
        )
        y = x @ w.T
        sm = to_supermask(w, sparsity=0.75)

        def loss(sm):
            return jnp.mean((ops.linear(x, sm) - y) ** 2)

        l0 = float(loss(sm))
        g = jax.jit(jax.grad(loss))
        for _ in range(100):
            grads = g(sm)
            sm = dataclasses.replace(
                sm, scores=sm.scores - 0.5 * grads.scores
            )
        assert float(loss(sm)) < l0 * 0.7
