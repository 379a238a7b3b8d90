"""Top-level quantization API: config dataclasses + ``quantize_``.

Mirrors the reference's ``torchao/quantization/quant_api.py`` surface with
the same config names and semantics. ``quantize_`` transforms a *params
pytree* (nested dicts of arrays) instead of an nn.Module tree: the JAX
analog of the reference's module DFS (``quant_api.py:482`` +
``_replace_with_custom_fn_if_matches_filter`` ``:173``) is a key-path walk
replacing weight leaves with quantized array pytrees.

Exact per-config semantics replicated (SURVEY.md §2.5.1):

- ``Int4WeightOnlyConfig(group_size)`` (ref ``quant_api.py:998``):
  ASYMMETRIC, qmin=0/qmax=15, eps=1e-6, FLOAT zero-point domain
  (tinygemm), preserve_zero=False, scale/zp in the weight dtype (bf16).
- ``Int8WeightOnlyConfig`` (ref ``:1201``): SYMMETRIC per-channel int8,
  eps=f32 eps.
- ``Int8DynamicActivationInt8WeightConfig`` (ref ``:1353``): weight
  SYMMETRIC per-channel int8 with NONE zero-point domain; act per-token
  symmetric ±127 reduced range.
- ``Float8DynamicActivationFloat8WeightConfig`` (ref ``:1602``): fp8
  weight + act-quant spec stored on the weight (PerRow default requires
  bf16 weights in the reference; here any fp dtype works).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import KernelPreference, PackingFormat
from torchao_tpu.qtypes.composition import (
    LinearActivationQuantizedArray,
)
from torchao_tpu.qtypes.float8 import Float8ActQuantSpec, Float8Array
from torchao_tpu.qtypes.intx import IntxArray
from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.granularity import (
    Granularity,
    PerGroup,
    PerRow,
    PerTensor,
)
from torchao_tpu.quantization.quant_primitives import (
    MappingType,
    ZeroPointDomain,
)
from torchao_tpu.quantization.transform_module import (
    get_quantize_handler,
    register_quantize_module_handler,
)

__all__ = [
    "quantize_",
    "Int4WeightOnlyConfig",
    "Int8WeightOnlyConfig",
    "Int8DynamicActivationInt8WeightConfig",
    "Int8DynamicActivationInt4WeightConfig",
    "Int4DynamicActivationInt4WeightConfig",
    "IntxWeightOnlyConfig",
    "UIntXWeightOnlyConfig",
    "Float8WeightOnlyConfig",
    "Float8DynamicActivationFloat8WeightConfig",
    "Float8StaticActivationFloat8WeightConfig",
    "FPXWeightOnlyConfig",
    "ModuleFqnToConfig",
    # BC lowercase aliases, mirroring reference `:1039` etc.
    "int4_weight_only",
    "int8_weight_only",
    "int8_dynamic_activation_int8_weight",
    "float8_weight_only",
    "float8_dynamic_activation_float8_weight",
]


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Int4WeightOnlyConfig(AOBaseConfig):
    """int4 weight-only, tinygemm float-zero-point scheme
    (reference ``quant_api.py:998-1139``)."""

    group_size: int = 128
    packing_format: PackingFormat = PackingFormat.TILED_NIBBLES
    use_hqq: bool = False
    version: int = 1


@dataclasses.dataclass
class Int8WeightOnlyConfig(AOBaseConfig):
    """int8 weight-only symmetric per-channel (reference
    ``quant_api.py:1201-1256``)."""

    group_size: Optional[int] = None
    version: int = 1


@dataclasses.dataclass
class Int8DynamicActivationInt8WeightConfig(AOBaseConfig):
    """int8 per-token dynamic act × int8 per-channel weight (reference
    ``quant_api.py:1353-1428``)."""

    act_mapping_type: MappingType = MappingType.SYMMETRIC
    weight_only_decode: bool = False
    version: int = 1


@dataclasses.dataclass
class Int8DynamicActivationInt4WeightConfig(AOBaseConfig):
    """8da4w: int8 asym per-token act × int4 sym group-wise weight
    (reference ``quant_api.py:609-706``)."""

    group_size: int = 32
    mapping_type: MappingType = MappingType.SYMMETRIC
    act_mapping_type: MappingType = MappingType.ASYMMETRIC
    version: int = 1


@dataclasses.dataclass
class Int4DynamicActivationInt4WeightConfig(AOBaseConfig):
    """int4 sym per-token act × int4 sym per-channel weight (reference
    ``quant_api.py:879-933``, CUTLASS s4s4)."""

    version: int = 1


@dataclasses.dataclass
class IntxWeightOnlyConfig(AOBaseConfig):
    """x-bit (1-8) weight-only quantization with configurable granularity
    (reference ``quant_api.py:1975-2088``)."""

    weight_dtype: str = "int4"
    granularity: Granularity = dataclasses.field(default_factory=PerGroup)
    mapping_type: MappingType = MappingType.SYMMETRIC
    version: int = 1


@dataclasses.dataclass
class UIntXWeightOnlyConfig(AOBaseConfig):
    """uint1-7 asymmetric weight-only (reference ``quant_api.py:1877-1933``,
    uintx bit-packed layout)."""

    dtype: str = "uint4"
    group_size: int = 64
    use_hqq: bool = False
    version: int = 1


@dataclasses.dataclass
class Float8WeightOnlyConfig(AOBaseConfig):
    """fp8 weight-only rowwise (reference ``quant_api.py:1466-1528``)."""

    weight_dtype: str = "float8_e4m3fn"
    version: int = 2


@dataclasses.dataclass
class Float8DynamicActivationFloat8WeightConfig(AOBaseConfig):
    """fp8 dynamic act × fp8 weight (reference ``quant_api.py:1602-1740``).

    ``granularity`` applies to both act and weight; PerRow is the TPU
    sweet spot (rowwise scales stay off the MXU critical path).
    """

    activation_dtype: str = "float8_e4m3fn"
    weight_dtype: str = "float8_e4m3fn"
    granularity: Optional[Granularity] = None
    activation_value_lb: Optional[float] = None
    activation_value_ub: Optional[float] = None
    fast_accum: bool = True
    version: int = 2


@dataclasses.dataclass
class Float8StaticActivationFloat8WeightConfig(AOBaseConfig):
    """fp8 static act scale × fp8 weight (reference
    ``quant_api.py:1791-1874``). ``scale`` is the pre-calibrated activation
    scale (stored at transform time)."""

    scale: Any = None
    activation_dtype: str = "float8_e4m3fn"
    weight_dtype: str = "float8_e4m3fn"
    granularity: Optional[Granularity] = None
    version: int = 1


@dataclasses.dataclass
class FPXWeightOnlyConfig(AOBaseConfig):
    """Sub-byte float (ExMy, e.g. fp6 = e3m2) weight-only (reference
    ``quant_api.py:2091-2142``; math from FP6-LLM).

    ``runtime`` (fp6 only): "dual" (default) serves the EXACT fp6 grid
    as a nibble+int8 plane pair riding the native int4/int8 MXU kernels
    (1.5 B/elem streamed — the throughput-true decode path on TPU, see
    FloatxArray.to_dual_planes); "packed" keeps the 6-bit shards
    resident (max capacity; decode via the fused Pallas kernel or XLA,
    both VPU-decode-bound on v5e — PERF.md round 3)."""

    ebits: int = 3
    mbits: int = 2
    runtime: str = "dual"
    version: int = 1


@dataclasses.dataclass
class Float8DynamicActivationInt4WeightConfig(AOBaseConfig):
    """fp8 (e4m3, per-row) dynamic activations × int4 grouped weights
    (reference ``quant_api.py:1161-1200``, the fbgemm f8i4 preshuffled
    kernel's config). TPU path: QDQ e4m3 activations (faithful fp8
    rounding) into the fused int4 Pallas kernel."""

    group_size: int = 128
    version: int = 1


@dataclasses.dataclass
class GemliteUIntXWeightOnlyConfig(AOBaseConfig):
    """API-parity config for the reference's gemlite Triton path
    (``quant_api.py:935-996``): 4-bit asymmetric (HQQ, like the
    reference's ``use_hqq=True if bit_width==4``) or 8-bit symmetric
    weight-only, optional dynamic int8 activations (``mode="dynamic"``).
    ``packing_bitwidth`` is a GPU packing knob — accepted, ignored
    (K-major nibble packing is the TPU layout)."""

    group_size: Optional[int] = 128
    bit_width: int = 4
    packing_bitwidth: Optional[int] = None
    mode: Optional[str] = "weight_only"
    version: int = 1


@dataclasses.dataclass
class FbgemmConfig(AOBaseConfig):
    """API-parity config for the reference's fbgemm-genai kernels
    (``quant_api.py:2145-2222``): dtype-triple dispatch onto the
    equivalent TPU-native paths. Supported triples match the reference:
    (bf16, int4, bf16), (e4m3, int4, bf16), (e4m3, e4m3, bf16)."""

    input_dtype: str = "bfloat16"
    weight_dtype: str = "int4"
    output_dtype: str = "bfloat16"
    block_size: Optional[Tuple[int, ...]] = None
    activation_scale_ub: float = 1200.0
    preshuffle: bool = False
    version: int = 1


@dataclasses.dataclass
class ModuleFqnToConfig(AOBaseConfig):
    """Per-module-FQN config map (reference ``quant_api.py:2225-2270``).
    Keys are path regexes (fullmatch) or the special ``"_default"``."""

    module_fqn_to_config: Dict[str, Optional[AOBaseConfig]] = dataclasses.field(
        default_factory=dict
    )
    version: int = 1


# BC lowercase aliases (reference keeps both spellings)
int4_weight_only = Int4WeightOnlyConfig
int8_weight_only = Int8WeightOnlyConfig
int8_dynamic_activation_int8_weight = Int8DynamicActivationInt8WeightConfig
int8_dynamic_activation_int4_weight = Int8DynamicActivationInt4WeightConfig
int4_dynamic_activation_int4_weight = Int4DynamicActivationInt4WeightConfig
uintx_weight_only = UIntXWeightOnlyConfig
fpx_weight_only = FPXWeightOnlyConfig
float8_weight_only = Float8WeightOnlyConfig
float8_dynamic_activation_float8_weight = (
    Float8DynamicActivationFloat8WeightConfig
)
float8_static_activation_float8_weight = (
    Float8StaticActivationFloat8WeightConfig
)
# reference `AOPerModuleConfig` is the old name of ModuleFqnToConfig
AOPerModuleConfig = ModuleFqnToConfig


# ---------------------------------------------------------------------------
# handlers: weight leaf -> quantized array
# ---------------------------------------------------------------------------


@register_quantize_module_handler(Int4WeightOnlyConfig)
def _int4_weight_only_transform(w: jnp.ndarray, config: Int4WeightOnlyConfig):
    group_size = config.group_size
    if group_size in (None, -1):
        group_size = w.shape[-1]
    if w.shape[-1] % group_size != 0:
        return w
    packing_format = config.packing_format
    if w.shape[-1] % 2 != 0:
        packing_format = PackingFormat.PLAIN
    block_size = tuple([1] * (w.ndim - 1) + [group_size])
    if config.use_hqq:
        def _hqq_one(wl):
            q, s, z, _ = qp.choose_qparams_and_quantize_affine_hqq(
                wl, nbits=4, group_size=group_size, optimize=True,
                compute_dtype=jnp.float32,
            )
            return q, s, z

        if w.ndim >= 3:
            # stacked [L, N, K]: solve layer-by-layer so only one
            # layer's f32 proximal-solver intermediates are live (the
            # stacked 8B solve peaks at ~24 GB otherwise)
            q, scale, zero = jax.lax.map(_hqq_one, w)
        else:
            q, scale, zero = _hqq_one(w)
        # HQQ produces INT-domain uint4 qparams; convert zero to FLOAT
        # domain the way the reference does for tinygemm compat
        # (`affine_quantized_tensor.py:291-297`): zp_float = -(zero - 8)*s + ...
        # Simpler: store INT domain directly.
        from torchao_tpu.qtypes.intx import IntxArray as _I
        from torchao_tpu.qtypes.intx import _tiled_eff_qparams_chunked

        scale_t = jnp.swapaxes(scale.astype(w.dtype), -1, -2)
        zero_t = jnp.swapaxes(zero.astype(w.dtype), -1, -2)
        qe, qchunk = _tiled_eff_qparams_chunked(
            scale_t, zero_t, 0, 15, ZeroPointDomain.INT,
            block_size[-1],
        )
        return _I(
            qdata=jnp.swapaxes(
                qp_pack_uint4(q) ^ jnp.uint8(0x80), -1, -2
            ),
            scale=scale_t,
            zero_point=zero_t,
            block_size=block_size,
            target_dtype="uint4",
            quant_min=0,
            quant_max=15,
            zero_point_domain=ZeroPointDomain.INT,
            packing_format=PackingFormat.TILED_NIBBLES,
            logical_shape=tuple(w.shape),
            activation_dtype=str(jnp.dtype(w.dtype)),
            qparams_eff=qe,
            qparams_eff_chunk=qchunk,
            nibbles_xored=True,
        )
    return IntxArray.from_hp(
        w,
        MappingType.ASYMMETRIC,
        block_size,
        "uint4",
        quant_min=0,
        quant_max=15,
        eps=1e-6,
        scale_dtype=w.dtype,
        zero_point_dtype=w.dtype,
        zero_point_domain=ZeroPointDomain.FLOAT,
        preserve_zero=False,
        packing_format=packing_format,
    )


def qp_pack_uint4(q: jnp.ndarray) -> jnp.ndarray:
    from torchao_tpu.qtypes.packing import pack_int4

    return pack_int4(q.astype(jnp.uint8), axis=-1)


@register_quantize_module_handler(Int8WeightOnlyConfig)
def _int8_weight_only_transform(w: jnp.ndarray, config: Int8WeightOnlyConfig):
    group_size = config.group_size
    if group_size is None:
        group_size = w.shape[-1]
    block_size = tuple([1] * (w.ndim - 1) + [group_size])
    return IntxArray.from_hp(
        w,
        MappingType.SYMMETRIC,
        block_size,
        "int8",
        eps=float(jnp.finfo(jnp.float32).eps),
        zero_point_dtype=jnp.int32,
    )


@register_quantize_module_handler(Int8DynamicActivationInt8WeightConfig)
def _int8_dyn_act_int8_weight_transform(
    w: jnp.ndarray, config: Int8DynamicActivationInt8WeightConfig
):
    if w.shape[-1] <= 16:  # reference skips tiny in_features (:1391)
        return w
    block_size = tuple([1] * (w.ndim - 1) + [w.shape[-1]])
    inner = IntxArray.from_hp(
        w,
        MappingType.SYMMETRIC,
        block_size,
        "int8",
        eps=float(jnp.finfo(jnp.float32).eps),
        zero_point_domain=ZeroPointDomain.NONE,
    )
    act = (
        "int8_per_token_sym"
        if config.act_mapping_type is MappingType.SYMMETRIC
        else "int8_per_token_asym"
    )
    if config.weight_only_decode:
        # reference `_..._noop_decode` (quant_api.py:1276-1296): decode
        # (seq len 1) skips activation quantization entirely
        act = act + "_noop_decode"
    return LinearActivationQuantizedArray(
        original_weight=inner, input_quant_name=act
    )


@register_quantize_module_handler(Int8DynamicActivationInt4WeightConfig)
def _int8_dyn_act_int4_weight_transform(
    w: jnp.ndarray, config: Int8DynamicActivationInt4WeightConfig
):
    group_size = config.group_size
    if group_size in (None, -1):
        group_size = w.shape[-1]
    if w.shape[-1] % group_size != 0:
        return w
    block_size = tuple([1] * (w.ndim - 1) + [group_size])
    # symmetric weights with MXU-friendly shapes take the K-major
    # TILED_NIBBLES layout (NONE zero-point domain — zp is 0 by
    # construction) so the fused W4A8 Pallas kernel
    # (kernels/w4a8_matmul.py, the s8s4-CUTLASS analog) can dispatch;
    # other cases keep the PLAIN int8-storage layout.
    Kp = w.shape[-1] // 2
    # NOTE no out-features (N) alignment gate here: packing eligibility
    # must not depend on kernel lane rules — the chunked leaf-by-leaf
    # init (init_utils) quantizes out-feature SLICES whose N is not
    # 128-aligned and concatenates the quantized parts; gating TILED on
    # the slice N silently degraded the 8da4w head to a PLAIN int-zp
    # weight that dequantized 1 GB per decode step (round-4 profile:
    # 64 tok/s vs 121). Kernel dispatch re-checks alignment on the
    # CONCATENATED array at call time.
    tiled = (
        config.mapping_type is MappingType.SYMMETRIC
        and w.ndim >= 2                      # incl. stacked [L, N, K]
        and w.shape[-1] % 2 == 0
        and Kp % max(8 * group_size, 128) == 0
    )
    if tiled:
        inner = IntxArray.from_hp(
            w,
            config.mapping_type,
            block_size,
            "int4",
            quant_min=-8,
            quant_max=7,
            zero_point_domain=ZeroPointDomain.NONE,
            packing_format=PackingFormat.TILED_NIBBLES,
        )
    else:
        inner = IntxArray.from_hp(
            w,
            config.mapping_type,
            block_size,
            "int4",
            quant_min=-8,
            quant_max=7,
        )
    act = (
        "int8_per_token_asym"
        if config.act_mapping_type is MappingType.ASYMMETRIC
        else "int8_per_token_sym"
    )
    return LinearActivationQuantizedArray(
        original_weight=inner, input_quant_name=act
    )


@register_quantize_module_handler(Int4DynamicActivationInt4WeightConfig)
def _int4_dyn_act_int4_weight_transform(
    w: jnp.ndarray, config: Int4DynamicActivationInt4WeightConfig
):
    block_size = tuple([1] * (w.ndim - 1) + [w.shape[-1]])
    inner = IntxArray.from_hp(
        w, MappingType.SYMMETRIC, block_size, "int4",
    )
    return LinearActivationQuantizedArray(
        original_weight=inner, input_quant_name="int8_per_token_sym"
    )


@register_quantize_module_handler(IntxWeightOnlyConfig)
def _intx_weight_only_transform(w: jnp.ndarray, config: IntxWeightOnlyConfig):
    block_size = config.granularity.block_size(w.shape)
    return IntxArray.from_hp(
        w, config.mapping_type, block_size, config.weight_dtype,
    )


@register_quantize_module_handler(UIntXWeightOnlyConfig)
def _uintx_weight_only_transform(w: jnp.ndarray, config: UIntXWeightOnlyConfig):
    group_size = config.group_size
    if group_size in (None, -1):
        group_size = w.shape[-1]
    block_size = tuple([1] * (w.ndim - 1) + [group_size])
    if config.use_hqq:
        nbits = int(config.dtype.lstrip("uint"))

        def _hqq_one(wl):
            q, s, z, _ = qp.choose_qparams_and_quantize_affine_hqq(
                wl, nbits=nbits, group_size=group_size, optimize=True,
                compute_dtype=jnp.float32,
            )
            return q, s, z

        if w.ndim >= 3:  # stacked: bound solver memory to one layer
            q, scale, zero = jax.lax.map(_hqq_one, w)
        else:
            q, scale, zero = _hqq_one(w)
        return IntxArray(
            qdata=q.astype(jnp.uint8),
            scale=scale.astype(w.dtype),
            zero_point=zero.astype(w.dtype),
            block_size=block_size,
            target_dtype=config.dtype,
            quant_min=0,
            quant_max=2**nbits - 1,
            zero_point_domain=ZeroPointDomain.INT,
            packing_format=PackingFormat.PLAIN,
            logical_shape=tuple(w.shape),
            activation_dtype=str(jnp.dtype(w.dtype)),
        )
    return IntxArray.from_hp(
        w, MappingType.ASYMMETRIC, block_size, config.dtype,
        packing_format=PackingFormat.BIT_SHARDS,
    )


@register_quantize_module_handler(Float8WeightOnlyConfig)
def _float8_weight_only_transform(w: jnp.ndarray, config: Float8WeightOnlyConfig):
    return Float8Array.from_hp(w, float8_dtype=config.weight_dtype)


def _granularity_to_fp8_block(g: Optional[Granularity], shape):
    if g is None or isinstance(g, PerRow):
        return tuple([1] * (len(shape) - 1) + [shape[-1]]), "per_row"
    if isinstance(g, PerTensor):
        return tuple(shape), "per_tensor"
    return g.block_size(shape), "per_row"


@register_quantize_module_handler(Float8DynamicActivationFloat8WeightConfig)
def _float8_dyn_act_float8_weight_transform(
    w: jnp.ndarray, config: Float8DynamicActivationFloat8WeightConfig
):
    block_size, gname = _granularity_to_fp8_block(config.granularity, w.shape)
    spec = Float8ActQuantSpec(
        float8_dtype=config.activation_dtype,
        granularity=gname,
        hp_value_lb=config.activation_value_lb,
        hp_value_ub=config.activation_value_ub,
    )
    return Float8Array.from_hp(
        w,
        block_size=block_size,
        float8_dtype=config.weight_dtype,
        act_quant_spec=spec,
        fast_accum=config.fast_accum,
    )


@register_quantize_module_handler(Float8StaticActivationFloat8WeightConfig)
def _float8_static_act_float8_weight_transform(
    w: jnp.ndarray, config: Float8StaticActivationFloat8WeightConfig
):
    # static act scale: stored via spec bounds equal to the calibrated scale;
    # dispatch treats lb==ub as a fixed scale
    block_size, gname = _granularity_to_fp8_block(config.granularity, w.shape)
    spec = Float8ActQuantSpec(
        float8_dtype=config.activation_dtype,
        granularity="per_tensor",
        hp_value_lb=None,
        hp_value_ub=float(config.scale) * 448.0
        if config.scale is not None
        else None,
    )
    return Float8Array.from_hp(
        w,
        block_size=block_size,
        float8_dtype=config.weight_dtype,
        act_quant_spec=spec,
    )


@register_quantize_module_handler(FPXWeightOnlyConfig)
def _fpx_weight_only_transform(w: jnp.ndarray, config: FPXWeightOnlyConfig):
    from torchao_tpu.qtypes.floatx import FloatxArray

    fx = FloatxArray.from_hp(w, config.ebits, config.mbits)
    if (
        getattr(config, "runtime", "dual") == "dual"
        and config.ebits == 3 and config.mbits == 2
        and isinstance(fx, FloatxArray) and fx.kmajor
    ):
        return fx.to_dual_planes()
    return fx


@register_quantize_module_handler(Float8DynamicActivationInt4WeightConfig)
def _float8_dyn_act_int4_weight_transform(
    w: jnp.ndarray, config: Float8DynamicActivationInt4WeightConfig
):
    group_size = config.group_size
    if group_size in (None, -1):
        group_size = w.shape[-1]
    if w.shape[-1] % group_size != 0:
        return w
    block_size = tuple([1] * (w.ndim - 1) + [group_size])
    Kp = w.shape[-1] // 2
    # no out-features alignment gate (see the 8da4w handler note: the
    # chunked init quantizes N-slices; kernel dispatch re-checks the
    # concatenated array's alignment)
    tiled = (
        w.ndim >= 2
        and w.shape[-1] % 2 == 0
        and Kp % max(8 * group_size, 128) == 0
    )
    inner = IntxArray.from_hp(
        w, MappingType.SYMMETRIC, block_size, "int4",
        quant_min=-8, quant_max=7,
        zero_point_domain=(
            ZeroPointDomain.NONE if tiled else ZeroPointDomain.INT
        ),
        packing_format=(
            PackingFormat.TILED_NIBBLES if tiled else PackingFormat.PLAIN
        ),
    )
    return LinearActivationQuantizedArray(
        original_weight=inner, input_quant_name="fp8_per_row"
    )


@register_quantize_module_handler(GemliteUIntXWeightOnlyConfig)
def _gemlite_uintx_weight_only_transform(
    w: jnp.ndarray, config: GemliteUIntXWeightOnlyConfig
):
    assert config.bit_width in (4, 8), config.bit_width
    group_size = config.group_size or w.shape[-1]
    if config.bit_width == 4:
        inner = _int4_weight_only_transform(
            w, Int4WeightOnlyConfig(group_size=group_size, use_hqq=True)
        )
    else:
        block_size = tuple([1] * (w.ndim - 1) + [group_size])
        inner = IntxArray.from_hp(
            w, MappingType.SYMMETRIC, block_size, "int8"
        )
    if config.mode == "dynamic":
        return LinearActivationQuantizedArray(
            original_weight=inner, input_quant_name="int8_per_token_sym"
        )
    return inner


@register_quantize_module_handler(FbgemmConfig)
def _fbgemm_config_transform(w: jnp.ndarray, config: FbgemmConfig):
    triple = (
        str(config.input_dtype), str(config.weight_dtype),
        str(config.output_dtype),
    )
    group_size = (
        config.block_size[-1] if config.block_size else 128
    )
    if triple == ("bfloat16", "int4", "bfloat16"):
        return _int4_weight_only_transform(
            w, Int4WeightOnlyConfig(group_size=group_size)
        )
    if triple == ("float8_e4m3fn", "int4", "bfloat16"):
        return _float8_dyn_act_int4_weight_transform(
            w, Float8DynamicActivationInt4WeightConfig(
                group_size=group_size
            )
        )
    if triple == ("float8_e4m3fn", "float8_e4m3fn", "bfloat16"):
        return _float8_dyn_act_float8_weight_transform(
            w, Float8DynamicActivationFloat8WeightConfig(
                granularity=PerRow(),
                activation_value_ub=config.activation_scale_ub,
            )
        )
    raise NotImplementedError(
        f"FbgemmConfig triple {triple} is not supported (reference "
        "supports the same three: quant_api.py:2168-2170)"
    )


# ---------------------------------------------------------------------------
# quantize_ over a params pytree
# ---------------------------------------------------------------------------


def _default_filter(path: str, leaf) -> bool:
    """Default: quantize 2-D float arrays (linear weights). The JAX analog
    of the reference's ``_is_linear`` module filter (``quant_api.py:271``).
    """
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
    )


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return ".".join(parts)


def quantize_(
    params,
    config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
):
    """Quantize weight leaves of a params pytree according to ``config``.

    Returns a new pytree where selected leaves are replaced by quantized
    array pytrees (the JAX counterpart of the reference's in-place module
    transform ``quantize_`` at ``quant_api.py:482``; functional because JAX
    params are immutable — the trailing underscore is kept for API parity).

    ``filter_fn(path, leaf)``: path is a dot-joined key path.
    """
    if filter_fn is None:
        filter_fn = _default_filter

    import re

    def transform(key_path, leaf):
        path = _path_str(key_path)
        if isinstance(config, ModuleFqnToConfig):
            cfg = None
            matched = False
            for pat, c in config.module_fqn_to_config.items():
                if pat == "_default":
                    continue
                if re.fullmatch(pat, path) or pat == path:
                    cfg, matched = c, True
                    break
            if not matched:
                cfg = config.module_fqn_to_config.get("_default")
            if cfg is None or not filter_fn(path, leaf):
                return leaf
            return get_quantize_handler(cfg)(leaf, cfg)
        if not filter_fn(path, leaf):
            return leaf
        return get_quantize_handler(config)(leaf, config)

    return jax.tree_util.tree_map_with_path(
        transform,
        params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )
