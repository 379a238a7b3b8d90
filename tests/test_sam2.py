"""SAM2-style video predictor tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.sam2 import (
    SAM2Args,
    SAM2VideoPredictor,
    sam2_linear_filter,
)
from torchao_tpu.quantization.quant_api import Int8WeightOnlyConfig, quantize_
from torchao_tpu.utils import compute_error


@pytest.fixture(scope="module")
def sam2():
    model = SAM2VideoPredictor(SAM2Args(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_video_propagation_shapes(sam2):
    model, params = sam2
    frames = jnp.asarray(
        np.random.RandomState(0).randn(3, 1, 64, 64, 3), jnp.float32
    )
    masks, ious = model.propagate_in_video(params, frames)
    assert masks.shape == (3, 1, 4, 16)  # T, B, mask tokens, patches
    assert ious.shape == (3, 1, 4)
    assert bool(jnp.all(jnp.isfinite(masks)))


def test_memory_conditions_later_frames(sam2):
    """The same frame content must produce different outputs once memory
    is populated (memory attention has an effect)."""
    model, params = sam2
    frame = jnp.asarray(
        np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
    )
    frames = jnp.stack([frame, frame])
    masks, _ = model.propagate_in_video(params, frames)
    diff = float(jnp.max(jnp.abs(masks[0] - masks[1])))
    assert diff > 1e-4, "memory bank had no effect"


def test_quantized_sam2(sam2):
    model, params = sam2
    frames = jnp.asarray(
        np.random.RandomState(2).randn(2, 1, 64, 64, 3), jnp.float32
    )
    ref, _ = model.propagate_in_video(params, frames)
    qparams = quantize_(
        params, Int8WeightOnlyConfig(), filter_fn=sam2_linear_filter
    )
    assert not isinstance(
        qparams["memory_attention"]["wq"], jnp.ndarray
    )
    out, _ = model.propagate_in_video(qparams, frames)
    assert compute_error(ref, out) > 20
