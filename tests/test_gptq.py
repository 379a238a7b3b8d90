"""GPTQ solver tests: error-compensated quantization must beat plain
round-to-nearest on the calibration distribution (the GPTQ guarantee),
and the produced IntxArray must integrate with qlinear dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.quantization.gptq import (
    GPTQQuantSpec,
    accumulate_hessian,
    gptq_quantize_int4,
    gptq_quantize_weight,
)
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig, quantize_
from torchao_tpu.utils import compute_error


@pytest.fixture(scope="module")
def calib():
    rs = np.random.RandomState(0)
    N, K = 64, 128
    W = jnp.asarray(rs.randn(N, K), jnp.float32)
    # correlated activations (GPTQ's advantage shows with correlation)
    A = rs.randn(K, K) * 0.3 + np.eye(K)
    X = jnp.asarray(rs.randn(512, K) @ A, jnp.float32)
    H = accumulate_hessian(None, X)
    return W, X, H


def test_gptq_beats_rtn(calib):
    W, X, H = calib
    Q, scales, zeros = gptq_quantize_weight(
        W, H, GPTQQuantSpec(group_size=32)
    )
    mid = 8.0
    g = 32
    dq = (
        (Q.reshape(64, -1, g) - mid) * scales[..., None]
        + zeros[..., None]
    ).reshape(64, 128)

    ref_out = X @ W.T
    gptq_out = X @ dq.T

    # plain round-to-nearest int4 (same tinygemm semantics)
    rtn = quantize_({"w": W}, Int4WeightOnlyConfig(group_size=32))["w"]
    rtn_out = X @ rtn.dequantize(jnp.float32).T

    err_gptq = float(jnp.mean((ref_out - gptq_out) ** 2))
    err_rtn = float(jnp.mean((ref_out - rtn_out) ** 2))
    assert err_gptq < err_rtn * 0.9, (
        f"GPTQ MSE {err_gptq} should beat RTN {err_rtn}"
    )


def test_gptq_int4_array_integrates(calib):
    W, X, H = calib
    qa = gptq_quantize_int4(W, H, group_size=32)
    assert qa.qdata.shape == (64, 64)  # [K/2, N] K-major
    x = X[:4].astype(jnp.bfloat16)
    out = ops.linear(x, qa)
    ref = x @ W.astype(jnp.bfloat16).T
    assert compute_error(ref, out) > 12


def test_gptq_generalizes_heldout(calib):
    """GPTQ must beat RTN on FRESH samples from the (correlated)
    calibration distribution — the property that transfers to real
    models. (On iid-gaussian activations H≈σ²I and GPTQ can only overfit
    sampling noise; that degenerate case is expected to lose.)"""
    import numpy as np

    rs = np.random.RandomState(7)
    N, K, g = 64, 128, 32
    W = jnp.asarray(rs.randn(N, K), jnp.float32)
    A = rs.randn(K, K) * 0.5 + np.eye(K)
    Xc = jnp.asarray(rs.randn(512, K) @ A, jnp.float32)
    Xt = jnp.asarray(rs.randn(256, K) @ A, jnp.float32)
    H = accumulate_hessian(None, Xc)
    Q, s, z = gptq_quantize_weight(W, H, GPTQQuantSpec(group_size=g))
    dq = (
        (Q.reshape(N, -1, g) - 8.0) * s[..., None] + z[..., None]
    ).reshape(N, K)
    rtn = quantize_({"w": W}, Int4WeightOnlyConfig(group_size=g))[
        "w"
    ].dequantize(jnp.float32)
    ref = Xt @ W.T
    eg = float(jnp.mean((Xt @ dq.T - ref) ** 2))
    er = float(jnp.mean((Xt @ rtn.T - ref) ** 2))
    assert eg < er * 0.8, (eg, er)


def test_gptq_llama_end_to_end():
    """Sequential GPTQ over the tiny Llama: runs, restacks, and the
    quantized model stays functional."""
    from torchao_tpu.models.llama.model import Transformer
    from torchao_tpu.quantization.gptq_llama import gptq_quantize_llama
    from torchao_tpu.qtypes import IntxArray
    import numpy as np

    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    calib = jnp.asarray(rs.randint(0, 512, (4, 32)), jnp.int32)
    test_toks = jnp.asarray(rs.randint(0, 512, (2, 16)), jnp.int32)

    ref, _ = model(params, test_toks)
    gptq = gptq_quantize_llama(model, params, calib, group_size=32)
    assert isinstance(gptq["layers"]["attention"]["wqkv"], IntxArray)
    assert gptq["layers"]["attention"]["wqkv"].qdata.ndim == 3  # stacked
    out, _ = model(gptq, test_toks)
    assert compute_error(ref, out) > 8


def test_gptq_quant_values_in_range(calib):
    W, _, H = calib
    Q, s, z = gptq_quantize_weight(W, H, GPTQQuantSpec(group_size=32))
    assert float(jnp.min(Q)) >= 0 and float(jnp.max(Q)) <= 15
    assert bool(jnp.all(s > 0))
