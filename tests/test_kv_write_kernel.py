"""Fused per-slot KV write kernel vs the chained-DUS reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchao_tpu.kernels.kv_cache_write import fused_smajor_token_write

L, B, Hkv, Dh, S = 3, 8, 8, 128, 256


def _ref_write(caches, kf, vf, ks, vs, pos, l):
    """Chained-DUS oracle (mirrors model._smajor_write semantics)."""
    k_q, v_q, k_scale, v_scale = caches
    for b in range(B):
        k_q = jax.lax.dynamic_update_slice(
            k_q, kf[b][None, None, :, None].astype(k_q.dtype),
            (l, b, 0, pos[b]),
        )
        v_q = jax.lax.dynamic_update_slice(
            v_q, vf[b][None, None, None, :].astype(v_q.dtype),
            (l, b, pos[b], 0),
        )
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, ks[b][None, None, :, None].astype(k_scale.dtype),
            (l, b, 0, pos[b]),
        )
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, vs[b][None, None, :, None].astype(v_scale.dtype),
            (l, b, 0, pos[b]),
        )
    return k_q, v_q, k_scale, v_scale


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.uint8])
def test_fused_write_matches_dus(qdtype):
    X = Hkv * Dh if qdtype == jnp.int8 else Hkv * Dh // 2
    rs = np.random.RandomState(0)
    lo, hi = (-128, 128) if qdtype == jnp.int8 else (0, 256)
    k_q = jnp.asarray(rs.randint(lo, hi, (L, B, X, S)), qdtype)
    v_q = jnp.asarray(rs.randint(lo, hi, (L, B, S, X)), qdtype)
    k_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.bfloat16)
    v_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.bfloat16)

    kf = jnp.asarray(rs.randint(lo, hi, (B, X)), qdtype)
    vf = jnp.asarray(rs.randint(lo, hi, (B, X)), qdtype)
    ks = jnp.asarray(rs.rand(B, Hkv), jnp.bfloat16)
    vs = jnp.asarray(rs.rand(B, Hkv), jnp.bfloat16)
    # positions exercise lane offsets, sublane offsets, band edges,
    # duplicates across slots (different b ⇒ different cache rows)
    pos = jnp.asarray([0, 1, 7, 8, 127, 128, 255, 129], jnp.int32)
    l = jnp.int32(1)

    got = fused_smajor_token_write(
        k_q, v_q, k_scale, v_scale, kf, vf, ks, vs, pos, l,
        interpret=True,
    )
    want = _ref_write(
        (k_q, v_q, k_scale, v_scale), kf, vf, ks, vs, np.asarray(pos), 1
    )
    names = ["k_q", "v_q", "k_scale", "v_scale"]
    for name, g, w in zip(names, got, want):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=name
        )


def test_fused_write_scale_f32_cache():
    X = Hkv * Dh
    rs = np.random.RandomState(1)
    k_q = jnp.asarray(rs.randint(-128, 128, (L, B, X, S)), jnp.int8)
    v_q = jnp.asarray(rs.randint(-128, 128, (L, B, S, X)), jnp.int8)
    k_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.float32)
    v_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.float32)
    kf = jnp.asarray(rs.randint(-128, 128, (B, X)), jnp.int8)
    vf = jnp.asarray(rs.randint(-128, 128, (B, X)), jnp.int8)
    ks = jnp.asarray(rs.rand(B, Hkv), jnp.float32)
    vs = jnp.asarray(rs.rand(B, Hkv), jnp.float32)
    pos = jnp.asarray(rs.randint(0, S, (B,)), jnp.int32)
    got = fused_smajor_token_write(
        k_q, v_q, k_scale, v_scale, kf, vf, ks, vs, pos, jnp.int32(0),
        interpret=True,
    )
    want = _ref_write(
        (k_q, v_q, k_scale, v_scale), kf, vf, ks, vs, np.asarray(pos), 0
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_model_smajor_update_fused_parity(monkeypatch):
    """model._smajor_update takes the fused-kernel path (interpret) and
    matches the chained-DUS path bit-exactly, int8 and packed int4."""
    import torchao_tpu.models.llama.model as M

    args = M.ModelArgs(
        n_layer=L, n_head=16, dim=16 * Dh, n_local_heads=Hkv,
        head_dim=Dh, vocab_size=128,
    )
    rs = np.random.RandomState(2)
    for quant in ("int8_smajor", "int4_smajor"):
        cache = M.init_kv_cache(args, B, S, quantize=quant)
        k = jnp.asarray(rs.randn(B, Hkv, 1, Dh), jnp.bfloat16)
        v = jnp.asarray(rs.randn(B, Hkv, 1, Dh), jnp.bfloat16)
        pos = jnp.asarray(rs.randint(0, S, (B,)), jnp.int32)
        lidx = jnp.int32(1)

        monkeypatch.setenv("TORCHAO_TPU_FUSED_KV_WRITE", "interpret")
        got = M._smajor_update(cache, k, v, pos, l=lidx)
        monkeypatch.setenv("TORCHAO_TPU_DISABLE_FUSED_KV_WRITE", "1")
        want = M._smajor_update(cache, k, v, pos, l=lidx)
        monkeypatch.delenv("TORCHAO_TPU_DISABLE_FUSED_KV_WRITE")
        for name in ("k_q", "v_q", "k_scale", "v_scale"):
            np.testing.assert_array_equal(
                np.asarray(got[name]), np.asarray(want[name]),
                err_msg=f"{quant}:{name}",
            )


def test_fused_write_oob_clamps_like_dus():
    """Positions ≥ S clamp to S−1 exactly like dynamic_update_slice."""
    X = Hkv * Dh
    rs = np.random.RandomState(4)
    k_q = jnp.asarray(rs.randint(-128, 128, (L, B, X, S)), jnp.int8)
    v_q = jnp.asarray(rs.randint(-128, 128, (L, B, S, X)), jnp.int8)
    k_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.bfloat16)
    v_scale = jnp.asarray(rs.rand(L, B, Hkv, S), jnp.bfloat16)
    kf = jnp.asarray(rs.randint(-128, 128, (B, X)), jnp.int8)
    vf = jnp.asarray(rs.randint(-128, 128, (B, X)), jnp.int8)
    ks = jnp.asarray(rs.rand(B, Hkv), jnp.bfloat16)
    vs = jnp.asarray(rs.rand(B, Hkv), jnp.bfloat16)
    pos = jnp.asarray(
        [S - 1, S, S + 5, 3 * S, 0, 17, S + 1, S - 2], jnp.int32
    )
    got = fused_smajor_token_write(
        k_q, v_q, k_scale, v_scale, kf, vf, ks, vs, pos, jnp.int32(0),
        interpret=True,
    )
    want = _ref_write(
        (k_q, v_q, k_scale, v_scale), kf, vf, ks, vs,
        np.minimum(np.asarray(pos), S - 1), 0,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
