"""SAM ViT encoder + aux subsystem (profiler, multihost) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.sam import (
    SamImageEncoder,
    sam_linear_filter,
)
from torchao_tpu.quantization.quant_api import (
    Int8DynamicActivationInt8WeightConfig,
    quantize_,
)
from torchao_tpu.sparsity import SemiSparseWeightConfig, sparsify_
from torchao_tpu.utils import compute_error


@pytest.fixture(scope="module")
def sam():
    model = SamImageEncoder.from_name("vit_tiny_debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


class TestSamEncoder:
    def test_forward_shape(self, sam):
        model, params = sam
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32
        )
        out = model(params, x)
        assert out.shape == (2, 16, 32)  # (64/16)^2 patches, out_chans
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_int8dq_plus_sparse_recipe(self, sam):
        """The reference's SAM headline recipe: int8dq + 2:4 sparsity."""
        model, params = sam
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
        )
        sparse = sparsify_(
            params, SemiSparseWeightConfig(), filter_fn=sam_linear_filter
        )
        ref_sparse = model(sparse, x)
        q = quantize_(
            sparse, Int8DynamicActivationInt8WeightConfig(),
            filter_fn=sam_linear_filter,
        )
        assert not isinstance(q["blocks"]["mlp"]["fc1"], jnp.ndarray)
        # patch embed untouched
        assert isinstance(q["patch_embed"]["weight"], jnp.ndarray)
        out = model(q, x)
        # int8dq on top of the sparse model: quantization error measured
        # against the sparse reference (random weights have no redundancy,
        # so 2:4 itself is lossy by construction — real models tolerate it)
        err = compute_error(ref_sparse, out)
        assert err > 20, err


class TestAux:
    def test_roofline_report(self):
        from torchao_tpu.profiler import roofline_report

        r = roofline_report(1, 4096, 4096, weight_bits=4)
        assert r["bound"] == "memory"
        r2 = roofline_report(4096, 4096, 4096)
        assert r2["bound"] == "compute"

    def test_heartbeat_single_host(self):
        from torchao_tpu.parallel.multihost import HeartbeatMonitor

        failures = []
        mon = HeartbeatMonitor(
            interval_s=0.05, on_failure=failures.append
        )
        assert mon._beat_once()
        mon.start()
        import time

        time.sleep(0.2)
        mon.stop()
        assert not failures
        assert mon.last_ok > 0
