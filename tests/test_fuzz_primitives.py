"""Shape/config fuzzing of the quantization primitives: quantize→
dequantize round trips must satisfy the per-block error bound for every
(shape, block, mapping, dtype) combination — the property that underlies
everything else."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.quant_primitives import MappingType

SHAPES_BLOCKS = [
    ((8, 32), (1, 32)),
    ((8, 32), (1, 8)),
    ((8, 32), (8, 32)),
    ((8, 32), (2, 8)),
    ((3, 5, 64), (1, 1, 16)),
    ((3, 5, 64), (1, 5, 64)),
    ((64,), (16,)),
]
DTYPES = ["int8", "int4", "uint4", "int2", "uint7"]
MAPPINGS = [MappingType.SYMMETRIC, MappingType.ASYMMETRIC]


@pytest.mark.parametrize(
    "shape,block", SHAPES_BLOCKS, ids=[str(s) for s, _ in SHAPES_BLOCKS]
)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("mapping", MAPPINGS, ids=["sym", "asym"])
def test_roundtrip_error_bound(shape, block, dtype, mapping):
    rs = np.random.RandomState(hash((shape, dtype)) % 2**31)
    x = jnp.asarray(rs.randn(*shape) * rs.uniform(0.1, 10), jnp.float32)
    scale, zp = qp.choose_qparams_affine(x, mapping, block, dtype)
    q = qp.quantize_affine(x, block, scale, zp, dtype)
    dq = qp.dequantize_affine(q, block, scale, zp)
    # per-element error ≤ scale/2 for in-range values (asym covers the
    # full range; sym may clip asymmetric data by up to one scale)
    max_scale = float(jnp.max(scale))
    bound = max_scale * (0.5 if mapping is MappingType.ASYMMETRIC else 1.0)
    err = float(jnp.max(jnp.abs(dq - x)))
    assert err <= bound + 1e-5, (err, bound)


@pytest.mark.parametrize("group", [8, 16, 32])
@pytest.mark.parametrize("k", [32, 96, 160])
def test_tinygemm_roundtrip_bound(group, k):
    if k % group:
        pytest.skip("group must divide k")
    rs = np.random.RandomState(group * k)
    x = jnp.asarray(rs.randn(4, k), jnp.float32)
    block = (1, group)
    s, z = qp.choose_qparams_affine_tinygemm(
        x, MappingType.ASYMMETRIC, block, "uint4", eps=1e-6
    )
    q = qp.quantize_affine_tinygemm(x, block, s, z, "uint4")
    dq = qp.dequantize_affine_tinygemm(q, block, s, z, "uint4", 0, 15)
    assert float(jnp.max(jnp.abs(dq - x))) <= float(jnp.max(s)) / 2 + 1e-5


def test_degenerate_constant_blocks():
    """All-equal blocks must not produce NaN/inf scales."""
    for val in (0.0, 5.0, -3.0):
        x = jnp.full((4, 32), val, jnp.float32)
        for mapping in MAPPINGS:
            s, z = qp.choose_qparams_affine(x, mapping, (1, 32), "int8")
            assert bool(jnp.all(jnp.isfinite(s))), (val, mapping)
            q = qp.quantize_affine(x, (1, 32), s, z, "int8")
            dq = qp.dequantize_affine(q, (1, 32), s, z)
            assert bool(jnp.all(jnp.isfinite(dq)))
            np.testing.assert_allclose(
                np.asarray(dq), val, atol=max(2e-2, abs(val) * 0.05)
            )
