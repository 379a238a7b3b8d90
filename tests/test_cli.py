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


def test_round3_recipe_strings():
    """The remaining reference -q surface (generate.py:356-690):
    int8dq_prefill_wo_decode, int4dq-<nbits>, embed-int8wo, spinquant,
    awq-uintx-<n>-<g>."""
    from torchao_tpu.quantization.quant_api import (
        Int4DynamicActivationInt4WeightConfig,
    )

    cfg = config_from_recipe("int8dq_prefill_wo_decode")
    assert isinstance(cfg, Int8DynamicActivationInt8WeightConfig)
    assert cfg.weight_only_decode

    assert isinstance(
        config_from_recipe("int4dq-8"), Int8DynamicActivationInt4WeightConfig
    )
    assert isinstance(
        config_from_recipe("int4dq-4"), Int4DynamicActivationInt4WeightConfig
    )
    assert config_from_recipe("embed-int8wo") == ("embed-int8wo",)
    assert config_from_recipe("spinquant") == ("spinquant",)
    assert config_from_recipe("awq-uintx-4-64") == ("awq", 4, 64, 2)


@pytest.mark.parametrize(
    "recipe",
    ["int8dq_prefill_wo_decode", "int4dq-8", "embed-int8wo", "spinquant",
     "awq-uintx-4-32-1"],
)
def test_cli_round3_recipes_e2e(tmp_path, recipe):
    """Each new recipe runs end-to-end on the tiny model (CPU)."""
    from torchao_tpu.models.llama import cli

    res = cli.main([
        "--model_name", "tiny-debug",
        "-q", recipe,
        "--prompt_len", "16",
        "--max_new_tokens", "4",
        "--num_samples", "1",
        "--write_result", str(tmp_path / "r.txt"),
    ])
    assert res["tokens_per_s"] > 0


@pytest.mark.parametrize("recipe", ["marlin", "sparse-marlin", "gemlite-4-64"])
def test_gpu_only_recipes_raise(recipe):
    with pytest.raises(ValueError, match="TPU"):
        config_from_recipe(recipe)


def test_unknown_recipe_raises():
    with pytest.raises(ValueError, match="Unknown"):
        config_from_recipe("int99wo")


def test_sparsity_flag_filters():
    """--sparsity semi-structured-mlp prunes FFN weights 2:4 before
    quantization (CLI wiring only — the full run needs a model)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchao_tpu.models.llama.model import (
        Transformer,
        ffn_only_filter,
    )
    from torchao_tpu.sparsity import SemiSparseWeightConfig, sparsify_

    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    sp = sparsify_(params, SemiSparseWeightConfig(), ffn_only_filter)
    w13 = np.asarray(sp["layers"]["feed_forward"]["w13"])
    assert abs(float((w13 == 0).mean()) - 0.5) < 0.02
    # attention untouched
    wq = np.asarray(sp["layers"]["attention"]["wqkv"])
    assert float((wq == 0).mean()) < 0.01


def test_cli_text_prompt(tmp_path, monkeypatch):
    """--prompt path: tokenize -> generate -> print (byte-level fallback
    tokenizer when no .model file is given)."""
    from torchao_tpu.models.llama import cli

    res = cli.main([
        "--model_name", "tiny-debug",
        "--prompt", "hello world",
        "--max_new_tokens", "4",
        "--temperature", "0.0",
        "--write_result", str(tmp_path / "r.txt"),
    ])
    assert len(res["tokens"]) == 4


def test_eval_cli_fake_weights_dry_run(tmp_path):
    """Turn-key eval plumbing (VERDICT r2 #5b): --fake-weights runs the
    exact wikitext code path on a dropped token file; a real run only
    swaps in --checkpoint + real tokens."""
    import numpy as np

    from torchao_tpu.models.llama import eval as eval_cli

    toks = np.random.RandomState(0).randint(0, 512, 2048).astype(np.int32)
    tok_file = tmp_path / "tokens.npy"
    np.save(tok_file, toks)
    ppl = eval_cli.main([
        "--model_name", "tiny-debug",
        "--tokens", str(tok_file),
        "--fake-weights",
        "-q", "int4wo-32",
        "--seq-len", "64",
        "--limit", "4",
    ])
    assert np.isfinite(ppl) and ppl > 1
