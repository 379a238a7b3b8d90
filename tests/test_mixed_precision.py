"""Mixed-precision search: sensitive layers get more bits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.prototype.mixed_precision import (
    mixed_precision_search,
    sensitivity_analysis,
)
from torchao_tpu.quantization.quant_api import (
    Int8WeightOnlyConfig,
    UIntXWeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


@pytest.fixture
def setup():
    rs = np.random.RandomState(0)
    params = {
        "a": {"w": jnp.asarray(rs.randn(64, 128), jnp.bfloat16)},
        "b": {"w": jnp.asarray(rs.randn(64, 128), jnp.bfloat16)},
    }
    x = jnp.asarray(rs.randn(8, 128), jnp.bfloat16)

    def fwd(p):
        # layer a's output is amplified 30x → its quant noise dominates
        return 30.0 * ops.linear(x, p["a"]["w"]) + ops.linear(x, p["b"]["w"])

    ref = fwd(params)

    def eval_fn(p):
        return compute_error(ref, fwd(p))

    return params, eval_fn


def test_sensitivity_orders_layers(setup):
    params, eval_fn = setup
    cfgs = [UIntXWeightOnlyConfig(dtype="uint2", group_size=32)]
    sens = sensitivity_analysis(params, eval_fn, cfgs)
    # quantizing the amplified layer hurts much more
    assert (
        sens["a.w"]["UIntXWeightOnlyConfig"]
        < sens["b.w"]["UIntXWeightOnlyConfig"] - 5
    )


def test_search_assigns_more_bits_to_sensitive(setup):
    params, eval_fn = setup
    candidates = [
        UIntXWeightOnlyConfig(dtype="uint2", group_size=32),  # cheapest
        Int8WeightOnlyConfig(),
    ]
    cfg_map, decisions = mixed_precision_search(
        params, eval_fn, candidates, min_quality=25.0
    )
    assert decisions["b.w"] == "UIntXWeightOnlyConfig"
    assert decisions["a.w"] in ("Int8WeightOnlyConfig", "hp")

    # the resulting config applies through quantize_
    q = quantize_(params, cfg_map)
    assert eval_fn(q) > 20
