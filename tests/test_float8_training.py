"""Float8 training tests: recipes, forward SQNR, gradient correctness vs
bf16 autodiff, sharded training step (mirrors ``test/float8/``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.float8 import (
    CastConfig,
    Float8LinearConfig,
    Float8TrainingWeight,
    ScalingGranularity,
    convert_to_float8_training,
    float8_linear,
)
from torchao_tpu.utils import compute_error


def _x(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


RECIPES = ["tensorwise", "rowwise", "rowwise_with_gw_hp"]


class TestFloat8Linear:
    @pytest.mark.parametrize("recipe", RECIPES)
    def test_forward_sqnr(self, recipe):
        cfg = Float8LinearConfig.from_recipe_name(recipe)
        x, w = _x((16, 64)), _x((32, 64), seed=1)
        ref = x @ w.T
        out = float8_linear(x, w, cfg)
        assert compute_error(ref, out) > 25

    @pytest.mark.parametrize("recipe", RECIPES)
    def test_gradients_close_to_bf16(self, recipe):
        cfg = Float8LinearConfig.from_recipe_name(recipe)
        x, w = _x((16, 64)), _x((32, 64), seed=1)

        def loss_fp8(x, w):
            return jnp.sum(float8_linear(x, w, cfg) ** 2)

        def loss_ref(x, w):
            return jnp.sum((x @ w.T) ** 2)

        gx, gw = jax.grad(loss_fp8, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        assert compute_error(rx, gx) > 20
        assert compute_error(rw, gw) > 20

    def test_axiswise_scales_differ_from_tensorwise(self):
        """Outlier row should be scaled independently under rowwise."""
        x = _x((16, 64))
        x = x.at[0].mul(100.0)
        w = _x((32, 64), seed=1)
        ref = x @ w.T
        t = float8_linear(x, w, Float8LinearConfig.from_recipe_name("tensorwise"))
        r = float8_linear(x, w, Float8LinearConfig.from_recipe_name("rowwise"))
        # rowwise isolates the outlier row → better overall error
        assert compute_error(ref, r) > compute_error(ref, t)


class TestConvertAndTrain:
    def test_convert_and_train_step(self):
        params = {"w": _x((32, 64))}
        fp8_params = convert_to_float8_training(params)
        assert isinstance(fp8_params["w"], Float8TrainingWeight)

        X, Y = _x((64, 64), seed=2), _x((64, 32), seed=3)

        def loss(p):
            return jnp.mean((ops.linear(X, p["w"]) - Y) ** 2)

        l0 = float(loss(fp8_params))
        g = jax.jit(jax.grad(loss))
        for _ in range(50):
            grads = g(fp8_params)
            fp8_params = jax.tree_util.tree_map(
                lambda w, gg: w - 0.05 * gg, fp8_params, grads
            )
        l1 = float(loss(fp8_params))
        assert l1 < l0 * 0.7, (l0, l1)

    def test_sharded_fp8_train_step(self):
        """fp8 training under dp×tp sharding (the FSDP2/TP composition of
        SURVEY §2.6, natively via NamedSharding)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        mesh = Mesh(np.array(devs).reshape(2, 4), ("data", "model"))
        params = convert_to_float8_training(
            {"w": _x((32, 64))},
            Float8LinearConfig.from_recipe_name("rowwise"),
        )
        sharded = jax.device_put(
            params,
            {"w": Float8TrainingWeight(
                weight=NamedSharding(mesh, P("model", None)),
                config=params["w"].config,
            )},
        )
        X = jax.device_put(
            _x((16, 64), seed=4), NamedSharding(mesh, P("data", None))
        )

        @jax.jit
        def step(p, X):
            def loss(p):
                return jnp.mean(ops.linear(X, p["w"]) ** 2)

            return jax.value_and_grad(loss)(p)

        val, grads = step(sharded, X)
        assert np.isfinite(float(val))
        ref_val, _ = step(params, _x((16, 64), seed=4))
        np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-2)


def test_precompute_fsdp_scale_path():
    """precompute_float8_dynamic_scale_for_fsdp: forward matches the
    in-forward amax path and gradients still flow to the hp weight."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchao_tpu import ops
    from torchao_tpu.float8 import (
        Float8LinearConfig,
        Float8TrainingWeight,
        convert_to_float8_training,
        precompute_float8_dynamic_scale_for_fsdp,
    )

    rs = np.random.RandomState(0)
    params = {"w": jnp.asarray(rs.randn(64, 128), jnp.float32)}
    p8 = convert_to_float8_training(
        params, config=Float8LinearConfig.from_recipe_name("tensorwise"),
        filter_fn=lambda p, l: True,
    )
    x = jnp.asarray(rs.randn(4, 128), jnp.float32)
    ref = ops.linear(x, p8["w"])
    pre = precompute_float8_dynamic_scale_for_fsdp(p8)
    assert pre["w"].precomputed_scale is not None
    out = ops.linear(x, pre["w"])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

    def loss(p):
        return jnp.sum(ops.linear(x, p["w"]) ** 2)

    g = jax.grad(loss)(pre)["w"]
    assert float(jnp.linalg.norm(g.weight)) > 0
    assert float(jnp.linalg.norm(g.precomputed_scale)) == 0.0


def test_auto_filter_for_recipe():
    import jax.numpy as jnp

    from torchao_tpu.float8 import _auto_filter_for_recipe

    f = _auto_filter_for_recipe("rowwise", filter_fqns=("lm_head",))
    big = jnp.zeros((4096, 4096))
    assert f("layers.w1", big)
    assert not f("lm_head.weight", big)
    assert not f("layers.small", jnp.zeros((1024, 2048)))   # small for rowwise
    assert not f("layers.ragged", jnp.zeros((4096, 4098)))  # not %16
