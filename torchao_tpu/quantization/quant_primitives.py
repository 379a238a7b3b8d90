"""Quantization primitive ops — pure jnp, shape-polymorphic over block_size.

TPU-native re-implementation of the reference's
``torchao/quantization/quant_primitives.py`` (L1 of SURVEY.md). The qparam
*math* is replicated exactly (same formulas, same clamping, same rounding
mode — round-half-to-even, matching ``torch.round``) so that wikitext
perplexity deltas match at equal bit-width/group-size:

- affine qparams (symmetric / symmetric-no-clipping-err / asymmetric):
  reference ``quant_primitives.py:1498-1577``
- tinygemm float-zero-point scheme (zero NOT preserved):
  ``scale = (max - min) / (qmax - qmin)``, ``zp = min + scale * mid`` with
  ``mid = (qmax + qmin + 1) / 2`` — reference ``quant_primitives.py:1239-1306``
- quantize/dequantize for INT / FLOAT / NONE zero-point domains —
  reference ``quant_primitives.py:306-960``
- float8 scale (``amax / fp8_max``, optional e8m0 power-of-2) —
  reference ``quant_primitives.py:2175-2300``

Everything here is jittable, differentiable where it should be (STE
rounding via a custom-gradient ``round_ste``), and free of Python-level
data-dependent control flow.
"""

from __future__ import annotations

import enum
import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

__all__ = [
    "MappingType",
    "ZeroPointDomain",
    "qmin_qmax",
    "choose_qparams_affine",
    "choose_qparams_affine_tinygemm",
    "choose_qparams_affine_dont_preserve_zero",
    "choose_qparams_affine_with_min_max",
    "quantize_affine",
    "quantize_affine_tinygemm",
    "quantize_affine_no_zero_point",
    "dequantize_affine",
    "dequantize_affine_tinygemm",
    "dequantize_affine_no_zero_point",
    "fake_quantize_affine",
    "fake_quantize_affine_cachemask",
    "choose_scale_float8",
    "quantize_affine_float8",
    "dequantize_affine_float8",
    "choose_qparams_and_quantize_affine_hqq",
    "choose_qparams_and_quantize_affine_qqq",
    "dequantize_affine_qqq",
    "choose_qparams_affine_floatx",
    "quantize_affine_floatx",
    "dequantize_affine_floatx",
    "exmy_encode",
    "exmy_decode",
    "quantize_activation_per_token_absmax",
    "per_token_block_size",
    "round_ste",
]


class MappingType(enum.Enum):
    """How float ranges map to quantized ranges (reference
    ``quant_primitives.py:54-77``)."""

    SYMMETRIC = "symmetric"
    SYMMETRIC_NO_CLIPPING_ERR = "symmetric_no_clipping_err"
    ASYMMETRIC = "asymmetric"


class ZeroPointDomain(enum.Enum):
    """Domain the zero point lives in (reference
    ``quant_primitives.py:78-90``)."""

    INT = "int"
    FLOAT = "float"
    NONE = "none"


# ---------------------------------------------------------------------------
# dtype handling
# ---------------------------------------------------------------------------


class TorchAODType(enum.Enum):
    """Placeholder dtype names for sub-byte ints (reference
    ``quant_primitives.py:91`` — torch lacks int1-7 dtypes; jnp mostly
    does too, so the canonical representation here is the string name,
    and this enum exists for API compatibility)."""

    INT1 = "int1"
    INT2 = "int2"
    INT3 = "int3"
    INT4 = "int4"
    INT5 = "int5"
    INT6 = "int6"
    INT7 = "int7"


# Sub-byte and standard integer quantization targets. Keys are canonical
# string names; jnp dtypes are accepted and canonicalized. Mirrors the
# reference's ``_DTYPE_TO_QVALUE_BOUNDS`` (torch.uint1-7/int1-8 union).
_INT_QVALUE_BOUNDS = {}
for _b in range(1, 9):
    _INT_QVALUE_BOUNDS[f"uint{_b}"] = (0, 2**_b - 1)
    _INT_QVALUE_BOUNDS[f"int{_b}"] = (-(2 ** (_b - 1)), 2 ** (_b - 1) - 1)
_INT_QVALUE_BOUNDS["int16"] = (-(2**15), 2**15 - 1)
_INT_QVALUE_BOUNDS["int32"] = (-(2**31), 2**31 - 1)
_INT_QVALUE_BOUNDS["uint16"] = (0, 2**16 - 1)

_FP8_BOUNDS = {
    "float8_e4m3fn": (float(ml_dtypes.finfo(ml_dtypes.float8_e4m3fn).min),
                      float(ml_dtypes.finfo(ml_dtypes.float8_e4m3fn).max)),
    "float8_e5m2": (float(ml_dtypes.finfo(ml_dtypes.float8_e5m2).min),
                    float(ml_dtypes.finfo(ml_dtypes.float8_e5m2).max)),
}

_JNP_NAME_CANON = {
    "int4": "int4",
    "uint4": "uint4",
    "int8": "int8",
    "uint8": "uint8",
    "int16": "int16",
    "int32": "int32",
    "float8_e4m3fn": "float8_e4m3fn",
    "float8_e5m2": "float8_e5m2",
}


def canonical_qdtype(dtype: Union[str, jnp.dtype, type]) -> str:
    """Canonicalize a quantization target dtype to its string name."""
    if isinstance(dtype, str):
        name = dtype
    else:
        name = jnp.dtype(dtype).name
    if name in _INT_QVALUE_BOUNDS or name in _FP8_BOUNDS:
        return name
    raise ValueError(f"Unsupported quantization dtype: {dtype!r}")


def is_float8_qdtype(dtype) -> bool:
    return canonical_qdtype(dtype) in _FP8_BOUNDS


def qmin_qmax(
    dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
) -> Tuple[Union[int, float], Union[int, float]]:
    """Resolve/validate (quant_min, quant_max) for a target dtype.

    Reference: ``quant_primitives.py:220-260`` (``_get_and_check_qmin_qmax``).
    """
    name = canonical_qdtype(dtype)
    lo, hi = _FP8_BOUNDS.get(name) or _INT_QVALUE_BOUNDS[name]
    if quant_min is None:
        quant_min = lo
    if quant_max is None:
        quant_max = hi
    if quant_min < lo:
        raise ValueError(f"quant_min {quant_min} out of bound for {name} (>= {lo})")
    if quant_max > hi:
        raise ValueError(f"quant_max {quant_max} out of bound for {name} (<= {hi})")
    return quant_min, quant_max


def storage_dtype(dtype: Union[str, jnp.dtype]) -> jnp.dtype:
    """The jnp dtype used to *store* quantized values of a target dtype.

    Sub-byte ints are stored unpacked as int8/uint8 at the primitive level
    (bit-packing is a layout concern, see ``torchao_tpu.qtypes``); int4/uint4
    use the native jnp 4-bit dtypes where a caller asks for them explicitly.
    """
    name = canonical_qdtype(dtype)
    if name in _FP8_BOUNDS:
        return jnp.dtype(name)
    if name in ("int16", "int32", "uint16"):
        return jnp.dtype(name)
    if name.startswith("uint"):
        return jnp.dtype("uint8")
    return jnp.dtype("int8")


# ---------------------------------------------------------------------------
# STE rounding
# ---------------------------------------------------------------------------


@jax.custom_vjp
def round_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Round-half-to-even with a straight-through gradient.

    Matches the reference's ``_Round`` autograd fn
    (``quant_primitives.py:208-219``): forward = ``torch.round`` (banker's
    rounding, identical to ``jnp.round``), backward = identity.
    """
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


# ---------------------------------------------------------------------------
# block_size → reduction machinery
# ---------------------------------------------------------------------------


def get_reduction_params(
    block_size: Sequence[int], input_size: Sequence[int]
) -> Tuple[List[int], List[int]]:
    """Find the reshape + reduction dims implementing N-D block quantization.

    Same contract as the reference's ``_get_reduction_params``
    (``quant_primitives.py:264-303``): e.g. block (3,3,2,10) over input
    (3,3,10,10) → reshape to (3,3,5,2,10), reduce over dims [0,1,3,4].
    """
    assert len(block_size) == len(input_size), (block_size, input_size)
    shape_for_reduction: List[int] = []
    reduction_dims: List[int] = []
    cur_dim = 0
    for i in range(len(block_size)):
        if block_size[i] != input_size[i] and block_size[i] > 1:
            assert input_size[i] % block_size[i] == 0, (
                f"input dim {i} ({input_size[i]}) not divisible by "
                f"block_size ({block_size[i]})"
            )
            shape_for_reduction.append(input_size[i] // block_size[i])
            shape_for_reduction.append(block_size[i])
            reduction_dims.append(cur_dim + 1)
            cur_dim += 2
        else:
            shape_for_reduction.append(input_size[i])
            if block_size[i] != 1:
                reduction_dims.append(cur_dim)
            cur_dim += 1
    return shape_for_reduction, reduction_dims


def _block_min_max(x: jnp.ndarray, block_size: Sequence[int]):
    """Per-block (min, max) with blocks folded out; returns (min, max,
    shape_for_reduction, reduction_dims)."""
    shape_for_reduction, reduction_dims = get_reduction_params(
        block_size, x.shape
    )
    xr = x.reshape(shape_for_reduction)
    min_val = jnp.min(xr, axis=tuple(reduction_dims))
    max_val = jnp.max(xr, axis=tuple(reduction_dims))
    return min_val, max_val, shape_for_reduction, reduction_dims


def _qparam_broadcast_shape(
    block_size: Sequence[int], input_size: Sequence[int]
) -> List[int]:
    """Shape scale/zero_point must be reshaped to so they broadcast against
    the input viewed as ``shape_for_reduction``."""
    shape_for_reduction, reduction_dims = get_reduction_params(
        block_size, input_size
    )
    out = list(shape_for_reduction)
    for d in reduction_dims:
        out[d] = 1
    return out


def _finfo_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)


# ---------------------------------------------------------------------------
# choose_qparams
# ---------------------------------------------------------------------------


def choose_qparams_affine(
    input: jnp.ndarray,
    mapping_type: MappingType,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    eps: Optional[float] = None,
    scale_dtype: Optional[jnp.dtype] = None,
    zero_point_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-block affine qparams; INT zero-point domain, zero preserved.

    Exact math of reference ``_choose_qparams_affine``
    (``quant_primitives.py:1498-1577``):

    - SYMMETRIC: ``scale = max(|min-|, max+) / ((qmax - qmin) / 2)``,
      ``zp = (qmax + qmin + 1) // 2``
    - SYMMETRIC_NO_CLIPPING_ERR: ``scale = max(min-/qmin, max+/qmax)``
    - ASYMMETRIC: ``scale = (max+ - min-) / (qmax - qmin)``,
      ``zp = clamp(qmin - round(min-/scale), qmin, qmax)``

    where ``min- = min(min_val, 0)`` and ``max+ = max(max_val, 0)``.
    """
    quant_min, quant_max = qmin_qmax(target_dtype, quant_min, quant_max)
    if scale_dtype is None:
        scale_dtype = input.dtype
    if eps is None:
        eps = _finfo_eps(input.dtype)

    min_val, max_val, _, _ = _block_min_max(input, block_size)
    min_val_neg = jnp.minimum(min_val, jnp.zeros_like(min_val))
    max_val_pos = jnp.maximum(max_val, jnp.zeros_like(max_val))

    if mapping_type in (
        MappingType.SYMMETRIC,
        MappingType.SYMMETRIC_NO_CLIPPING_ERR,
    ):
        if mapping_type is MappingType.SYMMETRIC:
            mmax = jnp.maximum(-min_val_neg, max_val_pos)
            scale = mmax / (float(quant_max - quant_min) / 2)
        else:
            smin = min_val_neg / float(quant_min)
            smax = max_val_pos / float(quant_max)
            scale = jnp.where(smin > smax, smin, smax)
        zero_point = jnp.full_like(
            scale, int((quant_max + quant_min + 1) / 2)
        )
        scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
        if zero_point_dtype is None:
            zero_point_dtype = jnp.int32
    elif mapping_type is MappingType.ASYMMETRIC:
        scale = (max_val_pos - min_val_neg) / float(quant_max - quant_min)
        scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
        zero_point = quant_min - round_ste(min_val_neg / scale)
        zero_point = jnp.clip(zero_point, quant_min, quant_max)
        if zero_point_dtype is None:
            zero_point_dtype = jnp.int32
    else:
        raise ValueError(f"Unsupported mapping type: {mapping_type}")

    return (
        scale.astype(scale_dtype),
        zero_point.astype(zero_point_dtype),
    )


def choose_qparams_affine_tinygemm(
    input: jnp.ndarray,
    mapping_type: MappingType,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    eps: Optional[float] = None,
    scale_dtype: Optional[jnp.dtype] = None,
    zero_point_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tinygemm-style qparams: FLOAT zero-point domain, zero NOT preserved.

    Exact math of reference ``_choose_qparams_affine_tinygemm``
    (``quant_primitives.py:1239-1306``)::

        scale = (max - min) / (qmax - qmin)          # raw min/max, no 0-clamp
        zp    = min + scale * mid,  mid = (qmax + qmin + 1) / 2

    Used by ``Int4WeightOnlyConfig`` for perplexity parity with the
    reference's int4 tinygemm path.
    """
    quant_min, quant_max = qmin_qmax(target_dtype, quant_min, quant_max)
    assert mapping_type is MappingType.ASYMMETRIC, mapping_type
    if scale_dtype is None:
        scale_dtype = input.dtype
    if zero_point_dtype is None:
        zero_point_dtype = input.dtype
    if eps is None:
        eps = _finfo_eps(input.dtype)

    min_val, max_val, _, _ = _block_min_max(input, block_size)
    scale = (max_val - min_val) / float(quant_max - quant_min)
    scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
    mid_point = (quant_max + quant_min + 1) / 2
    zero_point = min_val + scale * mid_point
    return scale.astype(scale_dtype), zero_point.astype(zero_point_dtype)


def choose_qparams_affine_dont_preserve_zero(
    input: jnp.ndarray,
    mapping_type: MappingType,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    eps: Optional[float] = None,
    scale_dtype: Optional[jnp.dtype] = None,
    zero_point_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Asymmetric qparams with INT zero-point domain but zero not preserved
    (raw min/max, no 0-clamping). Reference
    ``_choose_qparams_affine_dont_preserve_zero``
    (``quant_primitives.py:1310-1375``)."""
    quant_min, quant_max = qmin_qmax(target_dtype, quant_min, quant_max)
    assert mapping_type is MappingType.ASYMMETRIC, mapping_type
    if scale_dtype is None:
        scale_dtype = input.dtype
    if zero_point_dtype is None:
        zero_point_dtype = jnp.int32
    if eps is None:
        eps = _finfo_eps(input.dtype)

    min_val, max_val, _, _ = _block_min_max(input, block_size)
    scale = (max_val - min_val) / float(quant_max - quant_min)
    scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
    zero_point = quant_min - round_ste(min_val / scale)
    zero_point = jnp.clip(zero_point, quant_min, quant_max)
    return scale.astype(scale_dtype), zero_point.astype(zero_point_dtype)


def choose_qparams_affine_with_min_max(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    mapping_type: MappingType,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    eps: Optional[float] = None,
    scale_dtype: Optional[jnp.dtype] = None,
    zero_point_dtype: Optional[jnp.dtype] = None,
    preserve_zero: bool = True,
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Qparams from externally observed min/max (static-quant observer path).

    Reference ``choose_qparams_affine_with_min_max``
    (``quant_primitives.py:1378-1495``).
    """
    quant_min, quant_max = qmin_qmax(target_dtype, quant_min, quant_max)
    if scale_dtype is None:
        scale_dtype = min_val.dtype
    if eps is None:
        eps = _finfo_eps(min_val.dtype)

    if preserve_zero:
        min_val_neg = jnp.minimum(min_val, jnp.zeros_like(min_val))
        max_val_pos = jnp.maximum(max_val, jnp.zeros_like(max_val))
    else:
        min_val_neg = min_val
        max_val_pos = max_val

    if mapping_type is MappingType.SYMMETRIC:
        mmax = jnp.maximum(-min_val_neg, max_val_pos)
        scale = mmax / (float(quant_max - quant_min) / 2)
        scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
        if zero_point_domain is ZeroPointDomain.NONE:
            zero_point = None
        else:
            zero_point = jnp.full_like(
                scale, int((quant_max + quant_min + 1) / 2)
            )
        if zero_point_dtype is None:
            zero_point_dtype = jnp.int32
    else:
        assert mapping_type is MappingType.ASYMMETRIC
        scale = (max_val_pos - min_val_neg) / float(quant_max - quant_min)
        scale = jnp.maximum(scale, jnp.asarray(eps, scale.dtype))
        if zero_point_domain is ZeroPointDomain.FLOAT:
            mid_point = (quant_max + quant_min + 1) / 2
            zero_point = min_val_neg + scale * mid_point
            if zero_point_dtype is None:
                zero_point_dtype = min_val.dtype
        else:
            zero_point = quant_min - round_ste(min_val_neg / scale)
            zero_point = jnp.clip(zero_point, quant_min, quant_max)
            if zero_point_dtype is None:
                zero_point_dtype = jnp.int32

    scale = scale.astype(scale_dtype)
    if zero_point is not None:
        zero_point = zero_point.astype(zero_point_dtype)
    return scale, zero_point


# ---------------------------------------------------------------------------
# quantize / dequantize
# ---------------------------------------------------------------------------


def _view_qparam(
    p: Optional[jnp.ndarray],
    block_size: Sequence[int],
    input_size: Sequence[int],
) -> Optional[jnp.ndarray]:
    if p is None:
        return None
    return p.reshape(_qparam_broadcast_shape(block_size, input_size))


def quantize_affine(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: Optional[jnp.ndarray],
    output_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
) -> jnp.ndarray:
    """Affine quantize with INT zero-point domain:
    ``q = clamp(round(x / scale) + zp, qmin, qmax)``.

    Reference ``quantize_affine`` / ``_quantize_affine_no_dtype_cast``
    (``quant_primitives.py:306-462``). Sub-byte targets are stored in
    int8/uint8 (see :func:`storage_dtype`).
    """
    quant_min, quant_max = qmin_qmax(output_dtype, quant_min, quant_max)
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    x = input.reshape(shape_for_reduction)
    scale_v = _view_qparam(scale, block_size, original_shape)
    zp_v = _view_qparam(zero_point, block_size, original_shape)

    q = round_ste(x * (1.0 / scale_v))
    if zp_v is not None:
        q = q + zp_v
    q = jnp.clip(q, quant_min, quant_max)
    return q.reshape(original_shape).astype(storage_dtype(output_dtype))


def quantize_affine_tinygemm(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    output_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
) -> jnp.ndarray:
    """Affine quantize with FLOAT zero-point domain (tinygemm):
    ``q = clamp(round((x - (zp - scale*mid)) / scale), qmin, qmax)``.

    Reference ``_quantize_affine_tinygemm_no_dtype_cast``
    (``quant_primitives.py:512-573``).
    """
    quant_min, quant_max = qmin_qmax(output_dtype, quant_min, quant_max)
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    x = input.reshape(shape_for_reduction)
    scale_v = _view_qparam(scale, block_size, original_shape)
    zp_v = _view_qparam(zero_point, block_size, original_shape)

    mid_point = (quant_max + quant_min + 1) / 2
    min_val = zp_v - scale_v * mid_point
    q = jnp.clip(round_ste((x - min_val) / scale_v), quant_min, quant_max)
    return q.reshape(original_shape).astype(storage_dtype(output_dtype))


def quantize_affine_no_zero_point(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: None,
    output_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
) -> jnp.ndarray:
    """Affine quantize with NONE zero-point domain:
    ``q = clamp(round(x / scale), qmin, qmax)``.

    Reference ``_quantize_affine_no_zero_point_no_dtype_cast``
    (``quant_primitives.py:576-660``).
    """
    del zero_point
    quant_min, quant_max = qmin_qmax(output_dtype, quant_min, quant_max)
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    x = input.reshape(shape_for_reduction)
    scale_v = _view_qparam(scale, block_size, original_shape)
    q = jnp.clip(round_ste(x * (1.0 / scale_v)), quant_min, quant_max)
    return q.reshape(original_shape).astype(storage_dtype(output_dtype))


def dequantize_affine(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: Optional[jnp.ndarray],
    input_dtype: Union[str, jnp.dtype, None] = None,
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    *,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Affine dequantize, INT zero-point domain:
    ``x = (q - zp) * scale``.

    Reference ``dequantize_affine`` / ``_dequantize_affine_no_dtype_check``
    (``quant_primitives.py:689-834``).
    """
    del input_dtype, quant_min, quant_max
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    q = input.reshape(shape_for_reduction).astype(output_dtype)
    scale_v = _view_qparam(scale, block_size, original_shape)
    zp_v = _view_qparam(zero_point, block_size, original_shape)
    if zp_v is not None:
        q = q - zp_v.astype(output_dtype)
    dq = q * scale_v
    return dq.reshape(original_shape).astype(output_dtype)


def dequantize_affine_tinygemm(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    input_dtype: Union[str, jnp.dtype, None] = None,
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    *,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Affine dequantize, FLOAT zero-point domain (tinygemm):
    ``x = (q - mid) * scale + zp``.

    Reference ``_dequantize_affine_tinygemm_no_dtype_check``
    (``quant_primitives.py:939-1031``). quant_min/quant_max default to int4
    tinygemm's 0..15 only through the caller passing them; here they are
    required to compute the mid point, so they must be provided or derivable
    from ``input_dtype``.
    """
    if quant_min is None or quant_max is None:
        assert input_dtype is not None, (
            "need input_dtype or explicit quant_min/quant_max"
        )
        quant_min, quant_max = qmin_qmax(input_dtype, quant_min, quant_max)
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    q = input.reshape(shape_for_reduction)
    scale_v = _view_qparam(scale, block_size, original_shape)
    zp_v = _view_qparam(zero_point, block_size, original_shape)
    mid_point = (quant_max + quant_min + 1) / 2
    dq = (q - mid_point).astype(output_dtype) * scale_v
    if zp_v is not None:
        dq = dq + zp_v
    return dq.reshape(original_shape).astype(output_dtype)


def dequantize_affine_no_zero_point(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: None = None,
    input_dtype: Union[str, jnp.dtype, None] = None,
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    *,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Affine dequantize, NONE zero-point domain: ``x = q * scale``.

    Reference ``_dequantize_affine_no_zero_point_no_dtype_check``
    (``quant_primitives.py:836-935``).
    """
    del zero_point, input_dtype, quant_min, quant_max
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    q = input.reshape(shape_for_reduction).astype(output_dtype)
    scale_v = _view_qparam(scale, block_size, original_shape)
    dq = q * scale_v
    return dq.reshape(original_shape).astype(output_dtype)


# ---------------------------------------------------------------------------
# fake quant (QAT)
# ---------------------------------------------------------------------------


def fake_quantize_affine(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: Optional[jnp.ndarray],
    quant_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT,
) -> jnp.ndarray:
    """Quantize-dequantize roundtrip in the input dtype, STE gradient.

    Reference ``_fake_quantize_affine`` (``quant_primitives.py:1034-1079``).
    """
    fq, _ = fake_quantize_affine_cachemask(
        input, block_size, scale, zero_point, quant_dtype,
        quant_min, quant_max, zero_point_domain,
    )
    return fq


def fake_quantize_affine_cachemask(
    input: jnp.ndarray,
    block_size: Sequence[int],
    scale: jnp.ndarray,
    zero_point: Optional[jnp.ndarray],
    quant_dtype: Union[str, jnp.dtype],
    quant_min: Optional[Union[int, float]] = None,
    quant_max: Optional[Union[int, float]] = None,
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fake-quantize plus an outlier mask (True where values were NOT
    clamped). Reference ``_fake_quantize_affine_cachemask``
    (``quant_primitives.py:1082-1130``)."""
    quant_min, quant_max = qmin_qmax(quant_dtype, quant_min, quant_max)
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    x = input.reshape(shape_for_reduction)
    scale_v = _view_qparam(scale, block_size, original_shape)
    zp_v = _view_qparam(zero_point, block_size, original_shape)

    if zero_point_domain is ZeroPointDomain.INT:
        q_unclamped = round_ste(x * (1.0 / scale_v))
        if zp_v is not None:
            q_unclamped = q_unclamped + zp_v
        q = jnp.clip(q_unclamped, quant_min, quant_max)
        dq = q - (zp_v if zp_v is not None else 0.0)
        dq = dq * scale_v
    elif zero_point_domain is ZeroPointDomain.FLOAT:
        mid_point = (quant_max + quant_min + 1) / 2
        min_val = zp_v - scale_v * mid_point
        q_unclamped = round_ste((x - min_val) / scale_v)
        q = jnp.clip(q_unclamped, quant_min, quant_max)
        dq = (q - mid_point) * scale_v + zp_v
    else:
        q_unclamped = round_ste(x * (1.0 / scale_v))
        q = jnp.clip(q_unclamped, quant_min, quant_max)
        dq = q * scale_v

    mask = (q_unclamped >= quant_min) & (q_unclamped <= quant_max)
    return (
        dq.reshape(original_shape).astype(input.dtype),
        mask.reshape(original_shape),
    )


# ---------------------------------------------------------------------------
# float8
# ---------------------------------------------------------------------------


def _expand_scale_to_tensor_shape(
    scale: jnp.ndarray, target_shape: Sequence[int]
) -> jnp.ndarray:
    """Expand a blockwise scale to the full tensor shape via repeat.

    Reference ``_expand_scale_to_tensor_shape``
    (``quant_primitives.py:2226-2272``).
    """
    if tuple(scale.shape) == tuple(target_shape) or scale.size == 1:
        return scale
    assert len(scale.shape) == len(target_shape), (scale.shape, target_shape)
    expanded = scale
    for i, (t, s) in enumerate(zip(target_shape, scale.shape)):
        assert t % s == 0, (target_shape, scale.shape)
        rep = t // s
        if rep > 1:
            expanded = jnp.repeat(expanded, rep, axis=i)
    return expanded


def choose_scale_float8(
    tensor: jnp.ndarray,
    block_size: Sequence[int] = (),
    float8_dtype: jnp.dtype = jnp.float8_e4m3fn,
    scale_dtype: jnp.dtype = jnp.float32,
    hp_value_lb: Optional[float] = None,
    hp_value_ub: Optional[float] = None,
) -> jnp.ndarray:
    """Per-tensor or per-block float8 scale: ``amax / fp8_max`` (optionally
    clamped; optionally rounded to a power of two for e8m0 scales).

    Reference ``_choose_scale_float8`` (``quant_primitives.py:2175-2223``).
    The returned scale has the *blocked* shape (tensor shape // block_size),
    or scalar shape () for tensorwise.
    """
    quant_max = float(jnp.finfo(float8_dtype).max)
    t32 = tensor.astype(jnp.float32)
    if len(block_size) == 0:
        max_abs = jnp.max(jnp.abs(t32))
        if hp_value_lb is not None or hp_value_ub is not None:
            max_abs = jnp.clip(max_abs, hp_value_lb, hp_value_ub)
        scale = max_abs / quant_max
    else:
        shape_for_reduction, reduction_dims = get_reduction_params(
            block_size, tensor.shape
        )
        tr = t32.reshape(shape_for_reduction)
        max_abs = jnp.max(jnp.abs(tr), axis=tuple(reduction_dims))
        if hp_value_lb is not None or hp_value_ub is not None:
            max_abs = jnp.clip(max_abs, hp_value_lb, hp_value_ub)
        scale = max_abs / quant_max
        out_shape = [
            t // b for t, b in zip(tensor.shape, block_size)
        ]
        scale = scale.reshape(out_shape)

    if scale_dtype is not None and jnp.dtype(scale_dtype) != jnp.float32:
        # e8m0 power-of-two scale
        scale = jnp.exp2(jnp.round(jnp.log2(scale)))
    return scale.astype(jnp.float32)


def quantize_affine_float8(
    tensor: jnp.ndarray,
    scale: jnp.ndarray,
    float8_dtype: jnp.dtype = jnp.float8_e4m3fn,
) -> jnp.ndarray:
    """``clip(x / scale, -fp8_max, fp8_max).astype(fp8)``.

    Reference ``_quantize_affine_float8`` (``quant_primitives.py:2274-2296``).
    """
    t32 = tensor.astype(jnp.float32)
    scale_e = _expand_scale_to_tensor_shape(
        scale.astype(jnp.float32), tensor.shape
    )
    max_value = float(jnp.finfo(float8_dtype).max)
    scaled = jnp.clip(t32 / scale_e, -max_value, max_value)
    return scaled.astype(float8_dtype)


def dequantize_affine_float8(
    tensor: jnp.ndarray,
    scale: jnp.ndarray,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """``q.astype(f32) * scale``. Reference ``_dequantize_affine_float8``
    (``quant_primitives.py:2298-2310``)."""
    t32 = tensor.astype(jnp.float32)
    scale_e = _expand_scale_to_tensor_shape(
        scale.astype(jnp.float32), tensor.shape
    )
    return (t32 * scale_e).astype(output_dtype)


# ---------------------------------------------------------------------------
# floatx (fp1-7, FP6-LLM style ebits/mbits custom floats) — emulated
# ---------------------------------------------------------------------------


def choose_qparams_affine_floatx(
    tensor: jnp.ndarray, ebits: int, mbits: int
) -> jnp.ndarray:
    """Per-row scale for custom ExMy floats.

    Reference ``_choose_qparams_affine_floatx``
    (``quant_primitives.py:2114-2147``): scale maps the per-row absmax to the
    largest representable ExMy value, rounded down to a power of two.
    """
    exp_bias = 2 ** (ebits - 1) - 1
    max_normal = 2 ** (2**ebits - 2 - exp_bias) * (
        2 ** (mbits + 1) - 1
    ) / (2**mbits)
    t32 = tensor.astype(jnp.float32)
    amax = jnp.max(jnp.abs(t32), axis=-1)
    scale = jnp.exp2(jnp.floor(jnp.log2(amax / max_normal)))
    dtype_eps = 2.0 ** (-(exp_bias + mbits))
    scale = jnp.maximum(scale, dtype_eps)
    return scale.astype(tensor.dtype)


def _float_to_exmy(x32: jnp.ndarray, ebits: int, mbits: int) -> jnp.ndarray:
    """Round fp32 values to the nearest representable ExMy value (with
    subnormals), returned still in fp32."""
    exp_bias = 2 ** (ebits - 1) - 1
    max_normal = 2 ** (2**ebits - 2 - exp_bias) * (
        2 ** (mbits + 1) - 1
    ) / (2**mbits)
    sign = jnp.sign(x32)
    mag = jnp.abs(x32)
    mag = jnp.minimum(mag, max_normal)
    # exponent of each value, clamped to the subnormal floor
    exp = jnp.floor(jnp.log2(jnp.maximum(mag, 1e-45)))
    exp = jnp.clip(exp, -exp_bias + 1 - mbits + mbits, None)
    exp = jnp.maximum(exp, 1 - exp_bias)  # subnormal exponent floor
    # quantum for this exponent: 2^(exp - mbits)
    quantum = jnp.exp2(exp - mbits)
    rounded = jnp.round(mag / quantum) * quantum
    return sign * rounded


def quantize_affine_floatx(
    tensor: jnp.ndarray, scale: jnp.ndarray, ebits: int, mbits: int
) -> jnp.ndarray:
    """Scale then round to ExMy grid; values returned as fp32 on the grid
    (bit-packing is a layout concern). Reference
    ``_quantize_affine_floatx`` (``quant_primitives.py:2150-2172``)."""
    t32 = tensor.astype(jnp.float32) / scale.astype(jnp.float32)[..., None]
    return _float_to_exmy(t32, ebits, mbits)


def dequantize_affine_floatx(
    values: jnp.ndarray,
    scale: jnp.ndarray,
    ebits: int,
    mbits: int,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    del ebits, mbits
    return (
        values.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]
    ).astype(output_dtype)


def exmy_encode(
    values: jnp.ndarray, ebits: int, mbits: int
) -> jnp.ndarray:
    """Exact ExMy bit codes (uint8: sign | exp | mantissa) for values
    already ON the ExMy grid (the output of ``quantize_affine_floatx``).

    This is the storage half of the reference's fp6-LLM bit-packing
    (``csrc/cuda/fp6_llm/``, ``floatx_tensor_core_layout.py:457``): a
    (1+ebits+mbits)-bit code per element, laid out TPU-first via
    ``qtypes.packing.pack_uintx`` bit shards instead of the GPU's
    tensor-core bit-interleave."""
    exp_bias = 2 ** (ebits - 1) - 1
    v = values.astype(jnp.float32)
    sign = (v < 0).astype(jnp.int32)
    mag = jnp.abs(v)
    # normal exponent, clamped to the format's range
    e_unb = jnp.floor(jnp.log2(jnp.maximum(mag, 1e-45)))
    e_unb = jnp.clip(e_unb, 1 - exp_bias, 2 ** ebits - 1 - exp_bias)
    is_sub = mag < 2.0 ** (1 - exp_bias)
    E = jnp.where(is_sub, 0, e_unb.astype(jnp.int32) + exp_bias)
    M_norm = jnp.round(
        (mag / jnp.exp2(e_unb) - 1.0) * 2.0 ** mbits
    ).astype(jnp.int32)
    M_sub = jnp.round(
        mag * 2.0 ** (exp_bias - 1 + mbits)
    ).astype(jnp.int32)
    M = jnp.clip(jnp.where(is_sub, M_sub, M_norm), 0, 2 ** mbits - 1)
    code = (sign << (ebits + mbits)) | (E << mbits) | M
    return code.astype(jnp.uint8)


def exmy_decode(
    codes: jnp.ndarray, ebits: int, mbits: int
) -> jnp.ndarray:
    """Inverse of :func:`exmy_encode`: uint8 codes → fp32 grid values."""
    exp_bias = 2 ** (ebits - 1) - 1
    c = codes.astype(jnp.int32)
    sign = 1.0 - 2.0 * ((c >> (ebits + mbits)) & 1).astype(jnp.float32)
    E = (c >> mbits) & (2 ** ebits - 1)
    M = (c & (2 ** mbits - 1)).astype(jnp.float32)
    normal = (1.0 + M * 2.0 ** (-mbits)) * jnp.exp2(
        (E - exp_bias).astype(jnp.float32)
    )
    sub = M * 2.0 ** (1 - exp_bias - mbits)
    return sign * jnp.where(E == 0, sub, normal)


# ---------------------------------------------------------------------------
# HQQ (half-quadratic quantization) solver
# ---------------------------------------------------------------------------


def choose_qparams_and_quantize_affine_hqq(
    tensor: jnp.ndarray,
    nbits: int = 4,
    group_size: int = 64,
    optimize: bool = True,
    axis: int = 1,
    compute_dtype: jnp.dtype = jnp.float32,
    iters: int = 20,
    lp_norm: float = 0.7,
    beta: float = 1e1,
    kappa: float = 1.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[int, ...]]:
    """HQQ: proximal half-quadratic optimization of the zero point.

    Re-derivation of the reference's
    ``_choose_qparams_and_quantize_affine_hqq`` /
    ``optimize_weights_proximal_legacy`` (``quant_primitives.py:1915-2110``):
    alternating (a) lp-norm shrinkage of the residual W - dq(W), (b)
    closed-form zero update ``zp = mean(q - (W - e)/scale)`` per group.

    Returns (q_uint, scale, zero_point, orig_shape); dequant is
    ``(q - zp) * scale`` (INT domain, asymmetric, qmin=0).
    """
    qmin, qmax = 0.0, float(2**nbits - 1)
    orig_shape = tensor.shape
    w = tensor.astype(compute_dtype)
    assert axis == 1, "HQQ here operates on [n, k] with groups along k"
    w = w.reshape(-1, group_size)

    w_min = jnp.min(w, axis=1, keepdims=True)
    w_max = jnp.max(w, axis=1, keepdims=True)
    # reference: scale = (qmax - qmin) / (max - min), stored inverted
    denom = jnp.where(w_max == w_min, 1.0, w_max - w_min)
    inv_scale = (qmax - qmin) / denom
    zero = -w_min * inv_scale

    def _shrink(x):
        # lp-norm proximal shrinkage (reference shrink_lp_op)
        return jnp.sign(x) * jnp.maximum(
            jnp.abs(x) - (1.0 / beta) * jnp.abs(x) ** (lp_norm - 1), 0.0
        )

    def body(carry, _):
        zero_i, beta_i = carry
        wq = jnp.clip(jnp.round(w * inv_scale + zero_i), qmin, qmax)
        wr = (wq - zero_i) / inv_scale
        we = _shrink_beta(w - wr, beta_i)
        zero_new = jnp.mean(
            wq - (w - we) * inv_scale, axis=1, keepdims=True
        )
        return (zero_new, beta_i * kappa), None

    def _shrink_beta(x, beta_i):
        return jnp.sign(x) * jnp.maximum(
            jnp.abs(x) - (1.0 / beta_i) * jnp.abs(x) ** (lp_norm - 1), 0.0
        )

    if optimize:
        (zero, _), _ = jax.lax.scan(
            body, (zero, jnp.asarray(beta, compute_dtype)), None, length=iters
        )

    wq = jnp.clip(jnp.round(w * inv_scale + zero), qmin, qmax)
    scale = 1.0 / inv_scale
    q = wq.astype(jnp.uint8).reshape(orig_shape)
    # scale/zero per group: shape [..., k/group_size]
    qshape = tuple(orig_shape[:-1]) + (orig_shape[-1] // group_size,)
    scale = scale.reshape(qshape)
    zero = zero.reshape(qshape)
    return q, scale, zero, orig_shape


# ---------------------------------------------------------------------------
# GGUF-style k-quant (double quantization of scales)
# ---------------------------------------------------------------------------


def choose_qparams_gguf(
    input: jnp.ndarray,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype] = "uint4",
    n_super_blocks: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GGUF k-quant qparams (reference ``_choose_qparams_gguf``,
    ``quant_primitives.py:1650``): per-block asymmetric scale/min, with
    the block scales and mins themselves quantized to 6 effective bits
    against a per-super-block (``n_super_blocks`` blocks) super scale.

    Returns (super_block_scale_scale, super_block_min_scale,
    quantized_block_scale, quantized_block_min) — dequantized block
    qparams are ``q_scale * sb_scale_scale`` and ``q_min * sb_min_scale``.
    """
    quant_min, quant_max = qmin_qmax(target_dtype)
    min_val, max_val, _, _ = _block_min_max(input, block_size)
    # asymmetric, zero not preserved: scale=(max-min)/range, min offset
    scale = (max_val - min_val) / float(quant_max - quant_min)
    scale = jnp.maximum(scale, 1e-12)
    mins = -min_val  # stored as positive "min" like GGUF

    # reshape into super blocks along the last blocked axis
    sb_shape = scale.shape[:-1] + (
        scale.shape[-1] // n_super_blocks, n_super_blocks,
    )
    s_blocks = scale.reshape(sb_shape)
    m_blocks = mins.reshape(sb_shape)

    q6_max = 63.0
    sb_scale_scale = jnp.max(s_blocks, axis=-1, keepdims=True) / q6_max
    sb_min_scale = jnp.maximum(
        jnp.max(jnp.abs(m_blocks), axis=-1, keepdims=True), 1e-12
    ) / q6_max
    sb_scale_scale = jnp.maximum(sb_scale_scale, 1e-12)
    q_scale = jnp.clip(
        jnp.round(s_blocks / sb_scale_scale), 0, q6_max
    ).astype(jnp.uint8)
    q_min = jnp.clip(
        jnp.round(m_blocks / sb_min_scale), -q6_max, q6_max
    ).astype(jnp.int8)
    return sb_scale_scale, sb_min_scale, q_scale, q_min


def quantize_gguf(
    input: jnp.ndarray,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    super_block_scale_scale: jnp.ndarray,
    super_block_min_scale: jnp.ndarray,
    quantized_block_scale: jnp.ndarray,
    quantized_block_min: jnp.ndarray,
) -> jnp.ndarray:
    """``q = clamp(round((x + min) / scale))`` with double-dequantized
    block qparams (reference ``_quantize_gguf``)."""
    quant_min, quant_max = qmin_qmax(target_dtype)
    scale = (
        quantized_block_scale.astype(jnp.float32)
        * super_block_scale_scale
    ).reshape(quantized_block_scale.shape[:-2] + (-1,))
    mins = (
        quantized_block_min.astype(jnp.float32) * super_block_min_scale
    ).reshape(quantized_block_min.shape[:-2] + (-1,))
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    x = input.reshape(shape_for_reduction).astype(jnp.float32)
    s_v = _view_qparam(scale, block_size, original_shape)
    m_v = _view_qparam(mins, block_size, original_shape)
    q = jnp.clip(
        jnp.round((x + m_v) / jnp.maximum(s_v, 1e-12)),
        quant_min, quant_max,
    )
    return q.reshape(original_shape).astype(storage_dtype(target_dtype))


def dequantize_gguf(
    input: jnp.ndarray,
    block_size: Sequence[int],
    target_dtype: Union[str, jnp.dtype],
    super_block_scale_scale: jnp.ndarray,
    super_block_min_scale: jnp.ndarray,
    quantized_block_scale: jnp.ndarray,
    quantized_block_min: jnp.ndarray,
    output_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """``x = q * scale − min`` (reference ``_dequantize_gguf``)."""
    scale = (
        quantized_block_scale.astype(jnp.float32)
        * super_block_scale_scale
    ).reshape(quantized_block_scale.shape[:-2] + (-1,))
    mins = (
        quantized_block_min.astype(jnp.float32) * super_block_min_scale
    ).reshape(quantized_block_min.shape[:-2] + (-1,))
    original_shape = input.shape
    shape_for_reduction, _ = get_reduction_params(block_size, input.shape)
    q = input.reshape(shape_for_reduction).astype(jnp.float32)
    s_v = _view_qparam(scale, block_size, original_shape)
    m_v = _view_qparam(mins, block_size, original_shape)
    dq = q * s_v - m_v
    return dq.reshape(original_shape).astype(output_dtype)


def choose_qparams_and_quantize_affine_qqq(
    w: jnp.ndarray,
    num_bits: int = 4,
    group_size: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Marlin-QQQ W4A8 qparams (reference
    ``_choose_qparams_and_quantize_affine_qqq``,
    ``quant_primitives.py:1580``): two-level scheme for int8-activation ×
    int4-weight GEMMs.

    Grouped case (``group_size < K``): symmetric per-group int4 quant
    (``s_group = 2·absmax/15``, stored unsigned with +8 offset), then the
    *dequantized* weight is re-quantized per-channel to int8
    (``s_channel = absmax/127``) and the group scales are re-expressed
    relative to the channel scale (``s_group / s_channel``, fp16) — so the
    kernel epilogue applies ``int_acc · s_group_rel · s_channel``.

    Channelwise case (``group_size == K`` or -1): symmetric int4 only,
    ``s_channel = absmax/7`` then divided by ``2**(8-num_bits)`` to
    pre-compensate the unpack right-shift; ``s_group`` is empty.

    Returns ``(q_w, s_group, s_channel, w_ref)`` with the reference's
    dtypes (q int32-valued, s_group fp16, s_channel fp32, w_ref fp32).
    """
    assert num_bits == 4, f"Unsupported num_bits = {num_bits}"
    size_n, size_k = w.shape
    if group_size == -1:
        group_size = size_k
    assert group_size in (128, size_k), f"Unsupported groupsize = {group_size}"

    if group_size < size_k:
        wg = w.reshape(-1, group_size).astype(jnp.float32)
        max_q_val = 2**num_bits - 1
        half_q_val = (max_q_val + 1) // 2

        s_group = jnp.max(jnp.abs(wg), axis=-1, keepdims=True) * (
            2.0 / max_q_val
        )
        q_w = round_ste(wg / s_group).astype(jnp.int32) + half_q_val
        q_w = jnp.clip(q_w, 0, max_q_val)
        # reference computes in f32 with the small ints passed through
        # fp16 (exact): half * float32 promotes back to float32 in torch
        w_ref = (q_w - half_q_val).astype(jnp.float32) * s_group

        q_w = q_w.reshape(size_n, size_k)
        w_ref = w_ref.reshape(size_n, size_k)

        s_channel = jnp.max(jnp.abs(w_ref), -1, keepdims=True) / 127.0
        t_int8 = jnp.clip(
            jnp.round(w_ref / s_channel), -128, 127
        ).astype(jnp.int8)
        w_ref = t_int8.astype(jnp.float32) * s_channel
        s_channel = s_channel.reshape(-1, 1).astype(jnp.float32)

        s_group = (
            s_group.reshape(size_n, -1) / s_channel
        ).astype(jnp.float16)
    else:
        max_q_val = 2 ** (num_bits - 1) - 1
        wf = w.astype(jnp.float32)
        s_channel = jnp.max(jnp.abs(wf), -1, keepdims=True) / max_q_val
        q_w = jnp.clip(
            round_ste(wf / s_channel).astype(jnp.int32),
            -max_q_val, max_q_val,
        )
        w_ref = q_w.astype(jnp.float32) * s_channel
        s_group = jnp.zeros((size_n, 0), jnp.float16)
        # offset the unpack right-shift (reference keeps values in the
        # high bits of int8 storage)
        s_channel = (s_channel / 2 ** (8 - num_bits)).reshape(
            size_n, -1
        ).astype(jnp.float32)

    return q_w, s_group, s_channel, w_ref


def dequantize_affine_qqq(
    q_w: jnp.ndarray,
    s_group: jnp.ndarray,
    s_channel: jnp.ndarray,
    num_bits: int = 4,
    group_size: int = 128,
    output_dtype: jnp.dtype = jnp.float16,
) -> jnp.ndarray:
    """Inverse of :func:`choose_qparams_and_quantize_affine_qqq`
    (reference ``_dequantize_affine_qqq``)."""
    size_n, size_k = q_w.shape
    if group_size == -1:
        group_size = size_k
    if group_size < size_k:
        half_q_val = 2 ** (num_bits - 1)
        # reference multiplies the fused scales in fp16
        sg = s_group.astype(jnp.float16) * s_channel.astype(jnp.float16)
        sg = jnp.repeat(sg, group_size, axis=-1)
        dq = (q_w - half_q_val).astype(jnp.float16) * sg
    else:
        sc = s_channel * 2 ** (8 - num_bits)
        dq = q_w.astype(jnp.float16) * sc
    return dq.astype(output_dtype)


# ---------------------------------------------------------------------------
# per-token helpers
# ---------------------------------------------------------------------------


def per_token_block_size(x: jnp.ndarray) -> Tuple[int, ...]:
    """Block size for per-token quantization: (1, ..., 1, K).

    Reference ``_get_per_token_block_size``
    (``torchao/quantization/utils.py:141-146``)."""
    return tuple([1] * (x.ndim - 1) + [x.shape[-1]])


def quantize_activation_per_token_absmax(
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-token quantization with reduced range ±127.

    Reference ``_quantize_activation_per_token_absmax``
    (``torchao/quantization/utils.py:152-180``): eps=1e-5, scale dtype fp32
    for fp16 inputs else input dtype. Returns (int8 values, scale with
    shape ``t.shape[:-1] + (1,)``... scale returned unsqueezed for cache use).
    """
    block_size = per_token_block_size(t)
    scale_dtype = jnp.float32 if t.dtype == jnp.float16 else None
    scale, zero_point = choose_qparams_affine(
        t,
        MappingType.SYMMETRIC,
        block_size,
        "int8",
        quant_min=-127,
        quant_max=127,
        eps=1e-5,
        scale_dtype=scale_dtype,
    )
    q = quantize_affine(
        t, block_size, scale, zero_point, "int8", -127, 127
    )
    return q, scale
