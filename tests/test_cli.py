"""generate-CLI recipe parsing tests (the reference's -q surface)."""

import pytest

from torchao_tpu.models.llama.cli import config_from_recipe
from torchao_tpu.quantization.quant_api import (
    Float8DynamicActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    FPXWeightOnlyConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    UIntXWeightOnlyConfig,
)


@pytest.mark.parametrize(
    "recipe,expected",
    [
        ("int8wo", Int8WeightOnlyConfig),
        ("int8dq", Int8DynamicActivationInt8WeightConfig),
        ("int4wo-64", Int4WeightOnlyConfig),
        ("int4wo-32-hqq", Int4WeightOnlyConfig),
        ("8da4w-32", Int8DynamicActivationInt4WeightConfig),
        ("float8wo", Float8WeightOnlyConfig),
        ("float8dq-row", Float8DynamicActivationFloat8WeightConfig),
        ("float8dq-tensor", Float8DynamicActivationFloat8WeightConfig),
        ("fp6", FPXWeightOnlyConfig),
        ("uintx-3-64", UIntXWeightOnlyConfig),
    ],
)
def test_recipe_mapping(recipe, expected):
    cfg = config_from_recipe(recipe)
    assert isinstance(cfg, expected)


def test_recipe_params():
    assert config_from_recipe("int4wo-64").group_size == 64
    assert config_from_recipe("int4wo-32-hqq").use_hqq
    assert config_from_recipe("uintx-3-64").dtype == "uint3"
    assert config_from_recipe("fp6").ebits == 3


def test_autoquant_marker():
    assert config_from_recipe("autoquant-int4") == ("autoquant", "autoquant-int4")


@pytest.mark.parametrize("recipe", ["marlin", "sparse-marlin", "gemlite-4-64"])
def test_gpu_only_recipes_raise(recipe):
    with pytest.raises(ValueError, match="TPU"):
        config_from_recipe(recipe)


def test_unknown_recipe_raises():
    with pytest.raises(ValueError, match="Unknown"):
        config_from_recipe("int99wo")
