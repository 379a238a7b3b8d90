"""Sparsifier/scheduler/pruner, runtime 2:4 training, BSR block-sparse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.sparsity import (
    BlockSparseArray,
    CubicSL,
    LambdaSL,
    NearlyDiagonalSparsifier,
    SemiSparseTrainingWeight,
    WeightNormSparsifier,
    apply_masks,
    bsr_linear,
    fpgm_scores,
    prepare,
    prune_channel_pair,
    prune_ffn,
    saliency_scores,
    semi_structured_sparsify,
    squash_mask,
    swap_linear_with_semi_sparse_linear,
    unwrap_semi_sparse,
)
from torchao_tpu.sparsity.blocksparse import from_dense
from torchao_tpu.sparsity import sparsifier as sp
from torchao_tpu.utils import compute_error


class TestWeightNormSparsifier:
    def test_level_and_block_structure(self):
        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(32, 64), jnp.float32)
        s = WeightNormSparsifier(
            sparsity_level=0.5, sparse_block_shape=(1, 4)
        )
        m = np.asarray(s.update_mask(w))
        # half the (1,4) blocks off, blocks all-or-nothing
        blocks = m.reshape(32, 16, 4)
        per_block = blocks.sum(-1)
        assert set(np.unique(per_block)) <= {0, 4}
        level = 1 - m.mean()
        assert abs(level - 0.5) < 0.05
        # pruned blocks have lower L1 norm than kept ones
        norms = np.abs(np.asarray(w)).reshape(32, 16, 4).sum(-1)
        assert norms[per_block == 0].max() <= norms[per_block == 4].min() + 1e-6

    def test_zeros_per_block(self):
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(8, 16), jnp.float32)
        s = WeightNormSparsifier(
            sparsity_level=0.0, sparse_block_shape=(1, 4),
            zeros_per_block=2,
        )
        m = np.asarray(s.update_mask(w))
        # every block keeps exactly 2 of 4 (the 2 largest)
        blocks = m.reshape(8, 4, 4)
        assert (blocks.sum(-1) == 2).all()
        mags = np.abs(np.asarray(w)).reshape(8, 4, 4)
        kept = np.where(blocks, mags, 0.0).sum(-1)
        best2 = np.sort(mags, axis=-1)[..., -2:].sum(-1)
        np.testing.assert_allclose(kept, best2, rtol=1e-6)

    def test_2d_blocks(self):
        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(16, 16), jnp.float32)
        s = WeightNormSparsifier(
            sparsity_level=0.75, sparse_block_shape=(4, 4)
        )
        m = np.asarray(s.update_mask(w))
        tiles = m.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
        per_tile = tiles.reshape(16, 16).sum(-1)
        assert set(np.unique(per_tile)) <= {0, 16}
        assert (per_tile == 16).sum() == 4  # 25% of 16 tiles kept


def test_nearly_diagonal():
    s = NearlyDiagonalSparsifier(nearliness=3)
    m = np.asarray(s.update_mask(jnp.zeros((8, 8))))
    assert m[0, 0] and m[0, 1] and not m[0, 3]
    assert (np.diag(m)).all()
    # symmetric band on square matrices
    np.testing.assert_array_equal(m, m.T)


def test_schedulers():
    lam = LambdaSL(base_level=0.8, fn=lambda t: min(t / 10, 1.0))
    assert lam.level(0) == 0.0
    assert abs(lam.level(5) - 0.4) < 1e-9
    assert lam.level(100) == 0.8

    cub = CubicSL(init_level=0.0, final_level=0.9, init_t=10,
                  delta_t=1, total_steps=90)
    assert cub.level(0) == 0.0
    assert cub.level(10) == 0.0
    assert abs(cub.level(100) - 0.9) < 1e-9
    mids = [cub.level(t) for t in range(10, 101, 10)]
    assert all(b >= a for a, b in zip(mids, mids[1:]))  # monotone ramp


def test_prepare_step_squash_loop():
    rs = np.random.RandomState(3)
    params = {
        "a": {"weight": jnp.asarray(rs.randn(16, 32), jnp.float32)},
        "b": {"weight": jnp.asarray(rs.randn(8, 16), jnp.float32)},
        "norm": jnp.ones((16,), jnp.float32),  # 1-D: skipped
    }
    s = WeightNormSparsifier(sparsity_level=0.5)
    masks = prepare(params, s)
    assert set(masks) == {"a/weight", "b/weight"}
    masked = apply_masks(params, masks)
    assert float(jnp.mean(masked["a"]["weight"] == 0)) > 0.4
    # norm untouched
    np.testing.assert_array_equal(np.asarray(masked["norm"]), 1.0)
    # scheduled step to a higher level
    masks2 = sp.step(params, s, masks, sparsity_level=0.75)
    assert float(jnp.mean(~masks2["a/weight"])) > 0.7
    squashed, empty = squash_mask(params, masks2)
    assert empty == {}
    assert float(jnp.mean(squashed["a"]["weight"] == 0)) > 0.7


class TestPruner:
    def test_saliency_scores_rank(self):
        w = jnp.asarray([[1.0, 1.0], [5.0, 5.0], [0.1, 0.1]])
        s = np.asarray(saliency_scores(w))
        assert s.argmin() == 2 and s.argmax() == 1

    def test_fpgm_redundant_row(self):
        rs = np.random.RandomState(4)
        w = np.asarray(rs.randn(6, 8), np.float32)
        w[3] = (w[0] + w[1] + w[2] + w[4] + w[5]) / 5  # near the median
        s = np.asarray(fpgm_scores(jnp.asarray(w)))
        assert s.argmin() == 3

    def test_prune_channel_pair_function_preserved(self):
        """Pruning channels whose weights are ~0 barely changes the
        function; shapes shrink for real."""
        rs = np.random.RandomState(5)
        up = jnp.asarray(rs.randn(16, 8), jnp.float32)
        up = up.at[jnp.asarray([2, 9])].mul(1e-4)  # dead channels
        down = jnp.asarray(rs.randn(4, 16), jnp.float32)
        x = jnp.asarray(rs.randn(3, 8), jnp.float32)
        ref = x @ up.T @ down.T
        p, _, (d,), keep = prune_channel_pair(up, [down], 2 / 16)
        assert p.shape == (14, 8) and d.shape == (4, 14)
        assert not keep[2] and not keep[9]
        out = x @ p.T @ d.T
        assert compute_error(ref, out) > 40

    def test_prune_ffn_stacked(self):
        rs = np.random.RandomState(6)
        lw = {
            "w1": jnp.asarray(rs.randn(2, 16, 8), jnp.float32),
            "w3": jnp.asarray(rs.randn(2, 16, 8), jnp.float32),
            "w2": jnp.asarray(rs.randn(2, 8, 16), jnp.float32),
        }
        out = prune_ffn(lw, 0.25)
        assert out["w1"].shape == (2, 12, 8)
        assert out["w3"].shape == (2, 12, 8)
        assert out["w2"].shape == (2, 8, 12)


class TestSemiSparseTraining:
    def test_runtime_prune_and_grads(self):
        rs = np.random.RandomState(7)
        w = jnp.asarray(rs.randn(8, 16), jnp.float32)
        sw = semi_structured_sparsify(w)
        assert float(jnp.mean(sw == 0)) == 0.5
        # gradient flows only to kept entries
        g = jax.grad(lambda w: jnp.sum(semi_structured_sparsify(w) ** 2))(w)
        assert ((np.asarray(g) != 0) == (np.asarray(sw) != 0)).all()

    def test_training_loop_respects_mask(self):
        import optax

        rs = np.random.RandomState(8)
        params = {"lin": {"weight": jnp.asarray(rs.randn(8, 16),
                                                jnp.float32)}}
        x = jnp.asarray(rs.randn(4, 16), jnp.float32)
        tgt = jnp.asarray(rs.randn(4, 8), jnp.float32)
        prepared = swap_linear_with_semi_sparse_linear(
            params, lambda p, l: True
        )
        assert isinstance(prepared["lin"]["weight"],
                          SemiSparseTrainingWeight)

        def loss(p):
            return jnp.mean((ops.linear(x, p["lin"]["weight"]) - tgt) ** 2)

        opt = optax.sgd(0.05)
        state = opt.init(prepared)
        l0 = float(loss(prepared))
        for _ in range(40):
            grads = jax.grad(loss)(prepared)
            upd, state = opt.update(grads, state)
            prepared = optax.apply_updates(prepared, upd)
        assert float(loss(prepared)) < l0 * 0.6
        final = unwrap_semi_sparse(prepared)
        w = final["lin"]["weight"]
        assert isinstance(w, jnp.ndarray)
        assert float(jnp.mean(w == 0)) == 0.5  # deployable 2:4


class TestBlockSparse:
    def test_roundtrip_and_linear(self):
        rs = np.random.RandomState(9)
        w = np.asarray(rs.randn(64, 128), np.float32)
        # zero most 16x16 blocks, keep a known set
        blocks = w.reshape(4, 16, 8, 16)
        keep = np.zeros((4, 8), bool)
        keep[0, 1] = keep[2, 5] = keep[3, 0] = True
        w = (blocks * keep[:, None, :, None]).reshape(64, 128)
        bsa = from_dense(jnp.asarray(w), blocksize=16, threshold=1e-12)
        assert bsa.nnz_blocks == 3
        np.testing.assert_allclose(
            np.asarray(bsa.dequantize(jnp.float32)), w, rtol=1e-6
        )
        x = jnp.asarray(rs.randn(5, 128), jnp.float32)
        out = bsr_linear(x, bsa)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) @ w.T, rtol=1e-4, atol=1e-4
        )

    def test_dispatch_and_jit(self):
        rs = np.random.RandomState(10)
        w = jnp.asarray(rs.randn(64, 64), jnp.bfloat16)
        bsa = from_dense(w, blocksize=16, target_sparsity=0.5)
        assert isinstance(bsa, BlockSparseArray)
        x = jnp.asarray(rs.randn(3, 64), jnp.bfloat16)
        out = jax.jit(lambda x, w: ops.linear(x, w))(x, bsa)
        ref = x @ bsa.dequantize(jnp.bfloat16).T
        assert compute_error(ref, out) > 30

    def test_config_compressed_path(self):
        from torchao_tpu.sparsity import (
            BlockSparseWeightConfig,
            sparsify_,
        )

        rs = np.random.RandomState(11)
        params = {"w": jnp.asarray(rs.randn(64, 64), jnp.float32)}
        out = sparsify_(
            params,
            BlockSparseWeightConfig(
                blocksize=16, target_sparsity=0.75, compressed=True
            ),
            filter_fn=lambda p, l: True,
        )
        assert isinstance(out["w"], BlockSparseArray)
        assert out["w"].nnz_blocks == 4  # 25% of 16 blocks
