"""Float8 training configuration.

Mirrors the reference's ``torchao/float8/config.py``: ``ScalingGranularity``
(TENSORWISE/AXISWISE), per-gemm-operand ``CastConfig``, and
``Float8LinearConfig`` with the three recipes (``config.py:114-135``):
TENSORWISE, ROWWISE, ROWWISE_WITH_GW_HP.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

from torchao_tpu.core.config import AOBaseConfig


class ScalingGranularity(str, enum.Enum):
    TENSORWISE = "tensorwise"
    AXISWISE = "axiswise"


class ScalingType(str, enum.Enum):
    """Reference ``config.py`` ScalingType — only DYNAMIC scaling
    survives in the reference (delayed/static were removed); DISABLED
    maps to a ``CastConfig(dtype=None)`` hp operand."""

    DYNAMIC = "dynamic"
    DISABLED = "disabled"


@dataclasses.dataclass(frozen=True)
class Float8GemmConfig:
    """Reference ``Float8GemmConfig(use_fast_accum)``. On TPU the MXU
    always accumulates in f32 — the knob is accepted for API
    compatibility and has no effect."""

    use_fast_accum: bool = False


@dataclasses.dataclass(frozen=True)
class CastConfig:
    """How one operand of one gemm is cast to fp8 (reference
    ``config.py:78``). ``dtype=None`` keeps the operand in high precision
    (the *_HP recipes)."""

    scaling_granularity: ScalingGranularity = ScalingGranularity.TENSORWISE
    dtype: Optional[str] = "float8_e4m3fn"


@dataclasses.dataclass(frozen=True)
class Float8LinearConfig(AOBaseConfig):
    """Per-linear fp8 training config: independent cast configs for the
    three gemms (output, grad_input, grad_weight) — reference
    ``Float8LinearConfig`` + ``matmul_with_hp_or_float8_args``
    (``float8_linear.py:29-205``)."""

    cast_config_input: CastConfig = CastConfig()
    cast_config_weight: CastConfig = CastConfig()
    cast_config_grad_output: CastConfig = CastConfig(
        dtype="float8_e5m2"
    )
    # grad_weight gemm operand overrides (None → reuse the above)
    cast_config_input_for_grad_weight: Optional[CastConfig] = None
    cast_config_grad_output_for_grad_weight: Optional[CastConfig] = None
    round_scales_to_power_of_2: bool = False
    version: int = 1

    @classmethod
    def from_recipe_name(cls, name: str) -> "Float8LinearConfig":
        """TENSORWISE / ROWWISE / ROWWISE_WITH_GW_HP (reference
        ``Float8LinearRecipeName``, ``config.py:114``)."""
        name = name.lower()
        if name == "tensorwise":
            return cls()
        if name == "rowwise":
            ax = ScalingGranularity.AXISWISE
            return cls(
                cast_config_input=CastConfig(ax),
                cast_config_weight=CastConfig(ax),
                cast_config_grad_output=CastConfig(ax, "float8_e5m2"),
                round_scales_to_power_of_2=True,
            )
        if name == "rowwise_with_gw_hp":
            ax = ScalingGranularity.AXISWISE
            hp = CastConfig(dtype=None)
            return cls(
                cast_config_input=CastConfig(ax),
                cast_config_weight=CastConfig(ax),
                cast_config_grad_output=CastConfig(ax, "float8_e5m2"),
                cast_config_input_for_grad_weight=hp,
                cast_config_grad_output_for_grad_weight=hp,
                round_scales_to_power_of_2=True,
            )
        raise ValueError(f"Unknown recipe: {name}")


def _auto_filter_for_recipe(recipe, filter_fqns=()):
    """Returns a ``filter_fn(path, leaf)`` that skips linears known not
    to benefit from the recipe (reference ``float8_linear_utils.py``
    ``_auto_filter_for_recipe``): excluded fqns, dims not divisible by
    16, and small layers where quantization overhead dominates
    (rowwise: K<=2048 & N<4096; tensorwise: K<=4096 & N<=1024)."""
    name = (
        recipe if isinstance(recipe, str)
        else ("rowwise" if "rowwise" in str(recipe) else "tensorwise")
    ).lower()

    def f(path, leaf):
        if getattr(leaf, "ndim", 0) != 2:
            return False
        if any(fqn in path for fqn in filter_fqns):
            return False
        N, K = leaf.shape
        if N % 16 or K % 16:
            return False
        if name.startswith("rowwise"):
            if K <= 2048 and N < 4096:
                return False
        else:
            if K <= 4096 and N <= 1024:
                return False
        return True

    return f


# reference alias: the granularity union accepted by fp8 inference
from torchao_tpu.quantization.granularity import (  # noqa: E402,F401
    PerRow as _PerRow,
    PerTensor as _PerTensor,
)

FP8Granularity = (_PerTensor, _PerRow)
