"""Checkpoint round-trip tests for quantized pytrees (the reference's
test_load_and_run_checkpoint analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.checkpoint import load_quantized, save_quantized
from torchao_tpu.quantization.quant_api import (
    Float8DynamicActivationFloat8WeightConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt8WeightConfig,
    quantize_,
)
from torchao_tpu.quantization.granularity import PerRow


@pytest.mark.parametrize(
    "config",
    [
        Int4WeightOnlyConfig(group_size=32),
        Int8DynamicActivationInt8WeightConfig(),
        Float8DynamicActivationFloat8WeightConfig(granularity=PerRow()),
    ],
    ids=["int4wo", "int8dq", "fp8dq"],
)
def test_quantized_roundtrip(tmp_path, config):
    w = jnp.asarray(np.random.RandomState(0).randn(64, 128), jnp.bfloat16)
    params = quantize_({"layer": {"w": w}}, config)
    save_quantized(params, str(tmp_path / "ckpt"))
    restored = load_quantized(str(tmp_path / "ckpt"))

    assert type(restored["layer"]["w"]) is type(params["layer"]["w"])
    x = jnp.asarray(np.random.RandomState(1).randn(4, 128), jnp.bfloat16)
    a = ops.linear(x, params["layer"]["w"])
    b = ops.linear(x, restored["layer"]["w"])
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )


def test_mixed_tree_roundtrip(tmp_path):
    params = {
        "emb": jnp.ones((16, 8), jnp.bfloat16),
        "q": quantize_(
            {"w": jnp.asarray(
                np.random.RandomState(2).randn(32, 64), jnp.bfloat16
            )},
            Int4WeightOnlyConfig(group_size=32),
        )["w"],
        "norm": None,
    }
    save_quantized(params, str(tmp_path / "c2"))
    r = load_quantized(str(tmp_path / "c2"))
    np.testing.assert_array_equal(np.asarray(r["emb"]), np.asarray(params["emb"]))
    assert r["norm"] is None
    np.testing.assert_array_equal(
        np.asarray(r["q"].qdata), np.asarray(params["q"].qdata)
    )
    assert r["q"].block_size == params["q"].block_size


def test_async_checkpointer(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchao_tpu.checkpoint import (
        AsyncCheckpointer,
        load_quantized,
    )
    from torchao_tpu.quantization.quant_api import (
        Int8WeightOnlyConfig,
        quantize_,
    )

    rs = np.random.RandomState(0)
    params = quantize_(
        {"w": jnp.asarray(rs.randn(32, 64), jnp.bfloat16),
         "norm": jnp.ones((64,), jnp.float32)},
        Int8WeightOnlyConfig(),
        filter_fn=lambda p, l: l.ndim == 2,
    )
    ck = AsyncCheckpointer()
    d = str(tmp_path / "async_ck")
    ck.save(params, d)
    # mutate after save returns: the snapshot must be unaffected
    params["norm"] = params["norm"] * 0.0
    ck.wait()
    restored = load_quantized(d)
    np.testing.assert_array_equal(np.asarray(restored["norm"]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(restored["w"].qdata),
        np.asarray(params["w"].qdata),
    )


def test_sharded_restore(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from torchao_tpu.checkpoint import load_quantized, save_quantized

    rs = np.random.RandomState(1)
    params = {"w": jnp.asarray(rs.randn(16, 64), jnp.float32)}
    d = str(tmp_path / "sharded_ck")
    save_quantized(params, d)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("tp",))
    sh = NamedSharding(mesh, P(None, "tp"))

    def sharding_fn(path, meta):
        return sh if path == "w" else None

    restored = load_quantized(d, sharding_fn=sharding_fn)
    w = restored["w"]
    assert w.sharding == sh
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(params["w"]), rtol=1e-6
    )
