"""Flax linen interop tests: quantize a real linen model's kernels and
run it through QuantizedDense."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

flax = pytest.importorskip("flax")
import flax.linen as nn  # noqa: E402

from torchao_tpu.flax_interop import (  # noqa: E402
    QuantizedDense,
    quantize_flax_params,
)
from torchao_tpu.qtypes import IntxArray  # noqa: E402
from torchao_tpu.quantization.quant_api import (  # noqa: E402
    Int4WeightOnlyConfig,
    Int8WeightOnlyConfig,
)
from torchao_tpu.utils import compute_error  # noqa: E402


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = QuantizedDense(256, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        return QuantizedDense(64, dtype=jnp.bfloat16)(x)


def test_linen_model_quantizes_and_runs():
    model = MLP()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 128), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)

    qvars = quantize_flax_params(
        dict(variables), Int8WeightOnlyConfig()
    )
    k = qvars["params"]["QuantizedDense_0"]["kernel"]
    assert isinstance(k, IntxArray)
    assert k.shape == (256, 128)  # torch convention after transpose

    out = model.apply(qvars, x)
    assert out.shape == ref.shape
    assert compute_error(ref, out) > 25

    jout = jax.jit(model.apply)(qvars, x)
    np.testing.assert_allclose(
        np.asarray(jout, np.float32), np.asarray(out, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_linen_int4():
    model = MLP()
    x = jnp.asarray(np.random.RandomState(1).randn(2, 128), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    qvars = quantize_flax_params(
        dict(variables), Int4WeightOnlyConfig(group_size=32)
    )
    out = model.apply(qvars, x)
    assert compute_error(ref, out) > 12
