"""Fused attention+wo launch (``_kernel_attn_wo_i4``): correctness vs
the two-launch path (bdq attention kernel + dequant-matmul wo oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


def _stacked_int4_wo(rng, L, N, K, group_size=32):
    """Quantize L independent [N, K] weights and stack their pytree
    leaves — the model's stacked-layer weight form."""
    ws = []
    for _ in range(L):
        hp = {"w": jnp.asarray(rng.randn(N, K) * 0.05, jnp.float32)}
        qp = quantize_(hp, Int4WeightOnlyConfig(group_size=group_size))
        ws.append(qp["w"])
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ws)
    return stacked, ws


def test_fused_attn_wo_matches_two_launch():
    from torchao_tpu.kernels.quantized_attention import (
        attention_wo_fused_available,
        attention_wo_fused_i4,
        quantized_kv_decode_attention_bdq,
    )

    rng = np.random.RandomState(7)
    B, H, G, Dh, S, L = 1, 4, 4, 128, 2048, 2
    K = H * G * Dh                       # 2048 — wo input width
    N = 2048
    hd = H * Dh // 2

    q = jnp.asarray(rng.randn(B, H, G, Dh), jnp.bfloat16)
    # random packed-int4 cache bytes + scales (layout is opaque to the
    # equivalence check — both paths read the same arrays)
    kq = jnp.asarray(
        rng.randint(0, 256, (L, B, hd, S)), jnp.uint8
    )
    vq = jnp.asarray(
        rng.randint(0, 256, (L, B, S, hd)), jnp.uint8
    )
    ks = jnp.asarray(rng.rand(L, B, H, S) * .02 + .001, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(L, B, H, S) * .02 + .001, jnp.bfloat16)
    pos = jnp.asarray([S - 3], jnp.int32)

    wo, wo_layers = _stacked_int4_wo(rng, L, N, K)
    kw = attention_wo_fused_available(wo, H, G, Dh)
    assert kw is not None, "gate must accept the stacked int4 wo"

    for lidx in (0, 1):
        fused = attention_wo_fused_i4(
            q, kq, ks, vq, vs, pos,
            bs=1024, layer_idx=jnp.int32(lidx), interpret=True, **kw,
        )                                   # [B, N]

        attn = quantized_kv_decode_attention_bdq(
            q, kq, ks, vq, vs, pos,
            bs=1024, layer_idx=jnp.int32(lidx), interpret=True,
        )
        x = attn.reshape(B, H * G * Dh).astype(jnp.bfloat16)
        wd = wo_layers[lidx].dequantize(jnp.float32)
        ref = jnp.matmul(
            x.astype(jnp.float32), wd.T,
            preferred_element_type=jnp.float32,
        )

        err = compute_error(ref, jnp.asarray(fused, jnp.float32))
        assert err > 30, (lidx, float(err))


def test_fused_gate_rejects_ineligible():
    from torchao_tpu.kernels.quantized_attention import (
        attention_wo_fused_available,
    )

    rng = np.random.RandomState(8)
    # unstacked (2-D) weight → reject
    hp = {"w": jnp.asarray(rng.randn(1024, 2048) * 0.05, jnp.float32)}
    qp = quantize_(hp, Int4WeightOnlyConfig(group_size=32))
    assert attention_wo_fused_available(qp["w"], 4, 4, 128) is None
    # plain array → reject
    assert attention_wo_fused_available(hp["w"], 4, 4, 128) is None
