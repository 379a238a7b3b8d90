"""Quantized linear dispatch.

The explicit-registry replacement for the reference's
``_AQT_QLINEAR_DISPATCH_TABLE`` + ``_quantized_linear_op``
(``torchao/dtypes/affine_quantized_tensor_ops.py:113-296``): JAX has no
``__torch_function__``, so models call :func:`linear` directly and the
weight's type/static-metadata selects the implementation. Entries are
``(name, check_fn, impl_fn)`` scanned in registration order; anything
unmatched falls back to dequantize + high-precision dot (the reference's
fallback at ``affine_quantized_tensor_ops.py:281-296``).

Weight convention matches torch: ``w`` is ``[out_features, in_features]``
and ``linear(x, w) = x @ w.T (+ bias)``.

Kernel preference: each impl consults ``torchao_tpu.kernels`` for a Pallas
kernel when running on TPU (KernelPreference.AUTO); the jnp path is both
the CPU/testing fallback and the XLA-fusion baseline.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import math

import jax
import jax.numpy as jnp

from torchao_tpu.qtypes.base import (
    KernelPreference,
    PackingFormat,
    QuantizedArray,
)
from torchao_tpu.qtypes.composition import (
    LinearActivationQuantizedArray,
    WeightTensorWithLinearActivationScaleMetadata,
    register_act_quant,
)
from torchao_tpu.qtypes.float8 import (
    Float8Array,
    quantize_activation_float8,
)
from torchao_tpu.qtypes.intx import IntxArray
from torchao_tpu.quantization import quant_primitives as qp
from torchao_tpu.quantization.quant_primitives import ZeroPointDomain

_DISPATCH: List[Tuple[str, Callable, Callable]] = []


def register_qlinear_dispatch(name: str, check: Callable, impl: Callable):
    """Append a (check, impl) pair; first match wins (registration order,
    mirroring ``register_aqt_quantized_linear_dispatch``)."""
    _DISPATCH.append((name, check, impl))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _use_pallas(preference: KernelPreference) -> bool:
    if preference is KernelPreference.PALLAS:
        return True
    if preference is KernelPreference.XLA:
        return False
    return _on_tpu()


def linear(
    x: jnp.ndarray,
    w,
    bias: Optional[jnp.ndarray] = None,
    *,
    kernel_preference: KernelPreference = KernelPreference.AUTO,
    layer_idx=None,
) -> jnp.ndarray:
    """``x @ w.T + bias`` with quantized-weight dispatch.

    ``w`` may be a plain jnp array or any registered QuantizedArray.

    ``layer_idx`` (traced int32): ``w`` is a STACKED per-layer weight
    ([L, out, in]); kernels that support scalar-prefetch layer indexing
    consume the stacked leaves directly (zero-copy under ``lax.scan`` —
    a materialized per-layer slice cannot fuse into a Pallas custom
    call and costs a full weight copy per step, profiled at ~40% of a
    decode step); everything else falls back to ``take_layer``.
    """
    if not isinstance(w, QuantizedArray):
        if layer_idx is not None:
            w = w[layer_idx]
        out = jnp.matmul(x, w.T)
        return out + bias if bias is not None else out

    if layer_idx is not None:
        out = _stacked_linear(x, w, bias, kernel_preference, layer_idx)
        if out is not None:
            return out
        w = w.take_layer(layer_idx)

    for name, check, impl in _DISPATCH:
        if check(x, w, bias):
            return impl(x, w, bias, kernel_preference)

    # fallback: dequant + hp linear
    wd = w.dequantize(x.dtype)
    out = jnp.matmul(x, wd.T)
    return out + bias if bias is not None else out


def _int4_xla_min_m() -> int:
    """Row threshold above which int4wo takes the XLA dequant+matmul
    path (prefill-class, compute-bound; e2e: 8k ttft −7%). Env
    ``TORCHAO_TPU_INT4_XLA_MIN_M`` overrides; 0 disables."""
    import os

    v = os.environ.get("TORCHAO_TPU_INT4_XLA_MIN_M")
    # default 4096: covers the measured 8k-prefill win while every
    # measured serving shape (admission M = slots x chunk <= 2048)
    # stays on its adjudicated Pallas kernel
    return int(v) if v not in (None, "") else 4096


def _stacked_linear(x, w, bias, preference, layer_idx):
    """Zero-copy stacked-weight fast paths (returns None if no kernel
    supports this weight stacked — caller then slices)."""
    if not _use_pallas(preference):
        return None
    if isinstance(w, IntxArray) and w.ndim == 3:
        from torchao_tpu.kernels import int4_matmul, int8_matmul

        min_m = _int4_xla_min_m()
        if min_m and preference is KernelPreference.PALLAS:
            min_m = 0  # explicit PALLAS preference overrides the heuristic
        if min_m and (w.quant_max - w.quant_min) <= 15:
            m_rows = 1
            for d in x.shape[:-1]:
                m_rows *= int(d)
            if m_rows >= min_m:
                # prefill-class shapes take the XLA path: caller slices
                # the layer and the unstacked impl applies the same
                # threshold (see _impl_int4_weight_only)
                return None

        impl = int4_matmul.int4_dq_matmul_available(
            x, w, layer_idx=layer_idx
        )
        if impl is None and w.target_dtype == "int8":
            impl = int8_matmul.int8wo_mixed_matmul_available(
                x, w, layer_idx=layer_idx
            )
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out

    from torchao_tpu.qtypes.floatx import FloatxArray, Fp6DualArray

    if isinstance(w, Fp6DualArray) and w.a_plane.qdata.ndim == 3:
        from torchao_tpu.kernels import fp6_matmul

        # fused single-launch dual-plane kernel (round 4): halves the
        # launch count vs riding the int4+int8 kernels separately
        fused = fp6_matmul.fp6_dual_matmul_available(
            x, w, layer_idx=layer_idx
        )
        if fused is not None:
            out = fused(x, w)
            if out is not None:
                return out + bias if bias is not None else out
        out = linear(x, w.a_plane, layer_idx=layer_idx) + linear(
            x, w.b_plane, layer_idx=layer_idx
        )
        return out + bias if bias is not None else out

    if isinstance(w, FloatxArray) and w.qdata.ndim == 3:
        from torchao_tpu.kernels import fp6_matmul

        impl = fp6_matmul.fp6_dq_matmul_available(
            x, w, layer_idx=layer_idx
        )
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out

    if isinstance(w, Float8Array) and w.qdata.ndim == 3:
        from torchao_tpu.kernels import fp8_matmul

        # fp8wo AND fp8dq decode: the mixed bf16×e4m3 MXU dot streams
        # fp8 weights with zero cast work (probed native+exact); act
        # quant (when act_quant_spec is set) happens inside the impl
        impl = fp8_matmul.fp8_mixed_matmul_available(
            x, w, layer_idx=layer_idx
        )
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out

    if (
        isinstance(w, LinearActivationQuantizedArray)
        and isinstance(w.original_weight, IntxArray)
        and w.original_weight.ndim == 3
    ):
        from torchao_tpu.kernels import int4_matmul, int8_matmul

        inner: IntxArray = w.original_weight
        # 8da4w: centered int8 acts ride the stacked int4 kernel
        # (mirrors _impl_8da4w_centered)
        if inner.target_dtype == "int4" and w.input_quant_name in (
            "int8_per_token_sym", "int8_per_token_asym"
        ):
            impl = int4_matmul.int4_dq_matmul_available(
                x, inner, layer_idx=layer_idx
            )
            if impl is not None:
                quantized = w.quantize_input(x)
                if len(quantized) == 3:
                    q, scale, zp = quantized
                    xc = (
                        q.astype(jnp.int32)
                        - zp.astype(jnp.int32)[..., None]
                    ).astype(jnp.bfloat16)
                else:
                    q, scale = quantized
                    xc = q.astype(jnp.bfloat16)
                out = impl(xc, inner)
                out = (
                    out.astype(jnp.float32)
                    * scale.reshape(out.shape[:-1] + (1,)).astype(
                        jnp.float32
                    )
                ).astype(x.dtype)
                return out + bias if bias is not None else out
        if inner.target_dtype == "int8":
            # int8dq weight_only_decode: T==1 rides the stacked int8wo
            # mixed kernel (no bf16 weight materialization at all)
            if (
                w.input_quant_name.endswith("_noop_decode")
                and x.ndim >= 2 and x.shape[-2] == 1
            ):
                impl = int8_matmul.int8wo_mixed_matmul_available(
                    x, inner, layer_idx=layer_idx
                )
                if impl is not None:
                    out = impl(x, inner)
                    return out + bias if bias is not None else out
            if w.input_quant_name in (
                "int8_per_token_sym", "int8_per_token_sym_noop_decode"
            ):
                x_q, x_scale = w.quantize_input(x)
                impl = int8_matmul.int8_scaled_matmul_available(
                    x_q, inner, layer_idx=layer_idx
                )
                if impl is not None:
                    out = impl(x_q, x_scale, inner, x.dtype)
                    return out + bias if bias is not None else out
    return None


# ---------------------------------------------------------------------------
# activation quantizers (registry keys referenced by configs)
# ---------------------------------------------------------------------------


@register_act_quant("int8_per_token_sym")
def _int8_per_token_sym(x: jnp.ndarray):
    """Per-token symmetric int8 with reduced range ±127 (reference
    ``_int8_symm_per_token_reduced_range_quant``, ``quant_api.py:1258``)."""
    return qp.quantize_activation_per_token_absmax(x)


@register_act_quant("int8_per_token_sym_noop_decode")
def _int8_per_token_sym_noop_decode(x: jnp.ndarray):
    """Prefill path of weight_only_decode: same reduced-range sym quant
    (the decode-time noop is handled in the dispatch impl)."""
    return qp.quantize_activation_per_token_absmax(x)


@register_act_quant("fp8_per_row")
def _fp8_per_row(x: jnp.ndarray, hp_value_ub=None):
    """Per-row (per-token) e4m3 dynamic activation quant — the
    activation side of Float8DynamicActivationInt4WeightConfig
    (reference ``quant_api.py:1161``, fbgemm f8i4 path). Returns the
    scale squeezed to ``x.shape[:-1]`` (the generic LAQT QDQ path
    re-expands it)."""
    from torchao_tpu.qtypes.float8 import (
        Float8ActQuantSpec,
        quantize_activation_float8,
    )

    spec = Float8ActQuantSpec(
        float8_dtype="float8_e4m3fn",
        granularity="per_row",
        hp_value_ub=hp_value_ub,
    )
    q, scale = quantize_activation_float8(x, spec)
    return q, scale.reshape(x.shape[:-1])


@register_act_quant("int8_per_token_asym")
def _int8_per_token_asym(x: jnp.ndarray):
    """Per-token asymmetric int8 (reference ``_int8_asymm_per_token_quant``
    used by Int8DynamicActivationInt4WeightConfig)."""
    block = qp.per_token_block_size(x)
    scale, zp = qp.choose_qparams_affine(
        x, qp.MappingType.ASYMMETRIC, block, "int8",
        zero_point_dtype=jnp.int32,
    )
    q = qp.quantize_affine(x, block, scale, zp, "int8")
    return q, scale, zp


# ---------------------------------------------------------------------------
# impls
# ---------------------------------------------------------------------------


def _check_int8_weight_only(x, w, bias):
    return (
        isinstance(w, IntxArray)
        and w.target_dtype == "int8"
        and w.zero_point_domain in (ZeroPointDomain.INT, ZeroPointDomain.NONE)
        and w.packing_format is PackingFormat.PLAIN
        and w.ndim == 2
    )


def _impl_int8_weight_only(x, w: IntxArray, bias, preference):
    """int8wo hot path: hp matmul against cast int8 weight, scale epilogue.

    Matches the reference's int8wo path (``plain_layout.py:250-266``):
    ``(x @ w_q.T.to(x.dtype)) * scale`` — XLA fuses the cast+scale into the
    matmul the way inductor does. On TPU a Pallas kernel using the
    native mixed bf16×s8 MXU matmul (no cast at all) is preferred.
    """
    if _use_pallas(preference):
        from torchao_tpu.kernels.int8_matmul import (
            int8wo_mixed_matmul_available,
        )

        impl = int8wo_mixed_matmul_available(x, w)
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out
    w_cast = w.qdata.T.astype(x.dtype)
    out = jnp.matmul(x, w_cast)
    # scale is [N] (per-channel along out features) or [N, k_groups]
    scale = w.scale
    if scale.ndim == 2 and scale.shape[1] == 1:
        scale = scale[:, 0]
    if scale.ndim == 1:
        out = out * scale.astype(out.dtype)
    else:  # groupwise int8: rare; dequant path
        return _fallback(x, w, bias)
    return out + bias if bias is not None else out


def _check_int4_weight_only(x, w, bias):
    return (
        isinstance(w, IntxArray)
        and w.ndim == 2
        and (w.quant_max - w.quant_min) <= 15
        and (
            w.zero_point_domain is ZeroPointDomain.FLOAT
            # INT-domain int4 (HQQ / gemlite) rides the same kernel via
            # the precomputed float-equivalent zero (in qparams_eff)
            or (
                w.zero_point_domain is ZeroPointDomain.INT
                and getattr(w, "qparams_eff", None) is not None
            )
        )
    )


def _impl_int4_weight_only(x, w: IntxArray, bias, preference):
    """int4wo tinygemm-equivalent path.

    Reference hot path is ``aten._weight_int4pack_mm``
    (``tensor_core_tiled_layout.py:74-114``). TPU-natively this is the
    fused dequant-matmul Pallas kernel; the XLA path dequantizes groupwise
    and lets XLA fuse (still one pass over the weight).

    ``TORCHAO_TPU_INT4_XLA_MIN_M`` (default 4096): rows ≥ m
    (prefill-class shapes, compute-bound — the in-kernel dequant steals
    VPU cycles from the MXU there) take the XLA dequant+matmul path
    while decode/serving GEMVs keep the Pallas kernel. Measured e2e at
    8k prefill: ttft 1306.9 → 1216.8 ms (−7%), decode rows unchanged
    (PERF.md round-4 session 2). ``0`` disables (Pallas for every M).
    """
    min_m = _int4_xla_min_m()
    # an explicit per-call PALLAS preference wins over the global
    # prefill-shape heuristic (ADVICE r4): only AUTO/XLA take the route
    if min_m and preference is not KernelPreference.PALLAS:
        m_rows = 1
        for d in x.shape[:-1]:
            m_rows *= int(d)
        if m_rows >= min_m:
            out = _xla_tiled_int4_linear(x, w)
            if out is not None:
                return out + bias if bias is not None else out
    if _use_pallas(preference):
        from torchao_tpu.kernels import int4_matmul

        impl = int4_matmul.int4_dq_matmul_available(x, w)
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out
    out = _xla_tiled_int4_linear(x, w)
    if out is None:
        wd = w.dequantize(x.dtype)
        out = jnp.matmul(x, wd.T)
    return out + bias if bias is not None else out


def _xla_tiled_int4_linear(x, w: IntxArray):
    """XLA path for TILED_NIBBLES without re-concatenating the K axis.

    ``unpacked_qdata`` concatenates the lo/hi half-split along K; under
    K-axis (row-parallel TP) sharding that concat redistributes every
    weight shard each step — GSPMD compiles it to per-step weight
    all-to-alls (found by ``parallel.evidence.tp_decode_evidence``).
    Contraction order is free, so contract each packed half against its
    own activation columns instead: both dots are shard-local and XLA
    inserts one psum. Identical math to dequantize+matmul."""
    if w.packing_format is not PackingFormat.TILED_NIBBLES:
        return None
    N, K = w.shape[-2:]
    Kp = K // 2
    g = w.block_size[-1]
    nG2 = K // g
    if nG2 % 2:
        return None
    nG = nG2 // 2
    qd = w.qdata  # [.., Kp, N] K-major
    if w.nibbles_xored:
        qd = qd ^ jnp.uint8(0x80)
    lo = (qd & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (qd >> 4).astype(jnp.int8)
    mid = (w.quant_max + w.quant_min + 1) / 2 - w.quant_min
    s = w.scale.astype(jnp.float32)  # [.., K/g, N] K-major
    if w.zero_point is None:
        z = jnp.zeros_like(s)
    elif w.zero_point_domain is ZeroPointDomain.INT:
        z = (mid - w.zero_point.astype(jnp.float32)) * s
    else:
        z = w.zero_point.astype(jnp.float32)

    def dq(q, sl, zl):  # [.., Kp, N] bf16 dequantized half
        sf = jnp.repeat(sl, g, axis=-2)
        zf = jnp.repeat(zl, g, axis=-2)
        return (
            (q.astype(jnp.float32) - mid) * sf + zf
        ).astype(x.dtype)

    dq_lo = dq(lo, s[..., :nG, :], z[..., :nG, :])
    dq_hi = dq(hi, s[..., nG:, :], z[..., nG:, :])
    x2 = x.reshape(-1, K)
    out = jnp.matmul(x2[:, :Kp], dq_lo) + jnp.matmul(x2[:, Kp:], dq_hi)
    return out.reshape(x.shape[:-1] + (N,))


def _check_int8_dyn_act_int8_weight(x, w, bias):
    return (
        isinstance(w, LinearActivationQuantizedArray)
        and w.input_quant_name
        in ("int8_per_token_sym", "int8_per_token_sym_noop_decode")
        and isinstance(w.original_weight, IntxArray)
        and w.original_weight.target_dtype == "int8"
        # per-CHANNEL weight scales only (the int8dq scheme); grouped
        # int8 (e.g. gemlite-8-dq) takes the generic QDQ path
        and w.original_weight.scale.size
        == math.prod(w.original_weight.shape[:-1])
    )


def _impl_int8_dyn_act_int8_weight(x, w, bias, preference):
    """int8dq hot path: per-token int8 act × per-channel int8 weight on the
    MXU with int32 accumulation, matching
    ``_linear_int8_act_int8_weight_impl`` (``plain_layout.py:281-315``) /
    ``int_scaled_matmul`` (``kernel/intmm.py:108``), with
    ``lax.dot_general(..., preferred_element_type=int32)`` standing in for
    ``safe_int_mm`` (SURVEY.md §2.7)."""
    inner: IntxArray = w.original_weight
    if (
        w.input_quant_name.endswith("_noop_decode")
        and x.ndim >= 2 and x.shape[-2] == 1
    ):
        # weight_only_decode: hp activation x cast-dequant weight (the
        # int8wo hot path) during single-token decode
        w_cast = inner.qdata.reshape(inner.shape).T.astype(x.dtype)
        out = jnp.matmul(x, w_cast)
        scale = inner.scale.reshape(-1)
        out = out * scale.astype(out.dtype)
        return out + bias if bias is not None else out
    x_q, x_scale = w.quantize_input(x)

    if _use_pallas(preference):
        from torchao_tpu.kernels import int8_matmul

        impl = int8_matmul.int8_scaled_matmul_available(x_q, inner)
        if impl is not None:
            out = impl(x_q, x_scale, inner, x.dtype)
            return out + bias if bias is not None else out

    # XLA path: int8 × int8 → int32 on the MXU, then scale epilogue
    x2 = x_q.reshape(-1, x_q.shape[-1])
    acc = jax.lax.dot_general(
        x2,
        inner.qdata,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = inner.scale
    if w_scale.ndim == 2 and w_scale.shape[1] == 1:
        w_scale = w_scale[:, 0]
    xs = x_scale.reshape(-1, 1).astype(jnp.float32)
    out = acc.astype(jnp.float32) * xs * w_scale.astype(jnp.float32)[None, :]
    out = out.reshape(x.shape[:-1] + (inner.shape[0],)).astype(x.dtype)
    return out + bias if bias is not None else out


def _check_fp8_weight(x, w, bias):
    return isinstance(w, Float8Array) and w.ndim == 2


def _impl_fp8_weight(x, w: Float8Array, bias, preference):
    """fp8 paths: weight-only (no act spec) = cast-dequant matmul;
    dynamic-activation (spec on weight) = fp8×fp8 with rowwise scales,
    matching ``_linear_fp8_act_fp8_weight_impl``
    (``float8_layout.py:329-367``) / Float8Tensor linear."""
    if w.act_quant_spec is None:
        wd = w.dequantize(x.dtype)
        out = jnp.matmul(x, wd.T)
        return out + bias if bias is not None else out

    # non-rowwise/tensorwise weight scales (e.g. DeepSeek 128x128
    # blockwise) don't factor into the scaled-mm epilogue: take the
    # quantize-act → dequant-both path (fused blockwise kernel is a
    # planned Pallas item)
    if w.scale.size not in (1, w.shape[0]):
        x_q, x_scale = quantize_activation_float8(x, w.act_quant_spec)
        from torchao_tpu.quantization.quant_primitives import (
            dequantize_affine_float8 as _dq8,
            _expand_scale_to_tensor_shape as _expand,
        )

        xd = (
            x_q.astype(jnp.float32)
            * _expand(x_scale.astype(jnp.float32), x_q.shape)
        ).astype(x.dtype)
        out = jnp.matmul(xd, w.dequantize(x.dtype).T)
        return out + bias if bias is not None else out

    x_q, x_scale = quantize_activation_float8(x, w.act_quant_spec)

    if _use_pallas(preference):
        from torchao_tpu.kernels import fp8_matmul

        impl = fp8_matmul.fp8_rowwise_matmul_available(x_q, w)
        if impl is not None:
            out = impl(x_q, x_scale, w, x.dtype)
            return out + bias if bias is not None else out

    x2 = x_q.reshape(-1, x_q.shape[-1])
    acc = jax.lax.dot_general(
        x2,
        w.qdata,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w_scale = w.scale
    if w_scale.ndim == 2 and w_scale.shape[1] == 1:
        w_scale = w_scale[:, 0]
    xs = x_scale.reshape(-1, 1).astype(jnp.float32)
    out = acc * xs * w_scale.astype(jnp.float32)[None, :]
    out = out.reshape(x.shape[:-1] + (w.shape[0],)).astype(x.dtype)
    return out + bias if bias is not None else out


def _check_laqt_generic(x, w, bias):
    return isinstance(w, LinearActivationQuantizedArray)


def _impl_laqt_generic(x, w, bias, preference):
    """Generic dynamic-act path: quantize-dequantize the input (so the
    activation quantization error is faithfully modeled), dequantize the
    weight, hp matmul — the correctness fallback of
    ``LinearActivationQuantizedTensor``
    (``linear_activation_quantized_tensor.py:135``)."""
    quantized = w.quantize_input(x)
    if isinstance(quantized, tuple):
        if len(quantized) == 3:  # asymmetric: (q, scale, zp)
            q, scale, zp = quantized
            x_dq = (
                q.astype(jnp.float32) - zp.astype(jnp.float32)[..., None]
            ) * scale.astype(jnp.float32)[..., None]
        else:  # symmetric: (q, scale)
            q, scale = quantized
            x_dq = q.astype(jnp.float32) * scale.astype(jnp.float32)[
                ..., None
            ]
        x = x_dq.astype(x.dtype)
    # recurse into the dispatch with the (now hp-typed) quantized-
    # dequantized activation: the inner weight's own fast path applies —
    # e.g. the 8da4w TILED int4 weight runs the fused int4 Pallas
    # kernel instead of a full-weight dequantize
    return linear(x, w.original_weight, bias)


def _check_qat_fake_quantized(x, w, bias):
    from torchao_tpu.quantization.qat.api import QATFakeQuantizedArray

    return isinstance(w, QATFakeQuantizedArray)


def _impl_qat_fake_quantized(x, w, bias, preference):
    """QAT training path: fake-quantize activation + weight (STE), hp
    matmul — the JAX counterpart of ``FakeQuantizedLinear.forward``
    (reference ``qat/linear.py:42``)."""
    xq = w.fake_quantize_activation(x)
    wq = w.fake_quantized_weight()
    out = jnp.matmul(xq, wq.T)
    return out + bias if bias is not None else out


def _check_smoothquant_scale(x, w, bias):
    return isinstance(w, WeightTensorWithLinearActivationScaleMetadata)


def _impl_smoothquant_scale(x, w, bias, preference):
    x_scaled = x / w.equalization_scale.astype(x.dtype)
    return linear(x_scaled, w.original_weight, bias,
                  kernel_preference=preference)


def _fallback(x, w, bias):
    wd = w.dequantize(x.dtype)
    out = jnp.matmul(x, wd.T)
    return out + bias if bias is not None else out


# registration order matters (first match wins), mirroring
# affine_quantized_tensor_ops.py:191-262
register_qlinear_dispatch(
    "qat_fake_quantized", _check_qat_fake_quantized, _impl_qat_fake_quantized
)
register_qlinear_dispatch(
    "smoothquant_scale", _check_smoothquant_scale, _impl_smoothquant_scale
)
register_qlinear_dispatch(
    "int8_dyn_act_int8_weight",
    _check_int8_dyn_act_int8_weight,
    _impl_int8_dyn_act_int8_weight,
)


def _check_w4a8(x, w, bias):
    """8da4w fused path (reference s8s4 CUTLASS analog): symmetric
    per-token int8 act × TILED_NIBBLES int4 weight on TPU."""
    from torchao_tpu.kernels.w4a8_matmul import w4a8_dq_matmul_available

    return (
        isinstance(w, LinearActivationQuantizedArray)
        and w.input_quant_name == "int8_per_token_sym"
        and _on_tpu()
        and w4a8_dq_matmul_available(w.original_weight) is not None
    )


def _impl_w4a8(x, w, bias, preference):
    from torchao_tpu.kernels.w4a8_matmul import w4a8_dq_matmul_available

    if not _use_pallas(preference):
        return _impl_laqt_generic(x, w, bias, preference)
    q, scale = w.quantize_input(x)
    impl = w4a8_dq_matmul_available(w.original_weight)
    out = impl(q, scale, w.original_weight, x.dtype)
    return out + bias if bias is not None else out


register_qlinear_dispatch("w4a8_int4_weight", _check_w4a8, _impl_w4a8)


def _check_8da4w_centered(x, w, bias):
    """8da4w integer hot path (sym OR asym act): centered int8 activations
    ride the proven batched bf16×s8 int4 kernel."""
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul_available

    return (
        isinstance(w, LinearActivationQuantizedArray)
        and w.input_quant_name
        in ("int8_per_token_sym", "int8_per_token_asym")
        and isinstance(w.original_weight, IntxArray)
        and w.original_weight.target_dtype == "int4"
        and int4_dq_matmul_available(x, w.original_weight) is not None
    )


def _impl_8da4w_centered(x, w, bias, preference):
    """8da4w via centered activations on the int4 Pallas kernel.

    Replaces the QDQ-act chain (reference
    ``LinearActivationQuantizedTensor`` fallback,
    ``linear_activation_quantized_tensor.py:135``) AND the s8s4 CUTLASS
    integer kernel (``rowwise_scaled_linear_cutlass_*``, SURVEY §2.7)
    with one trick: per-token int8 activations, centered by their zero
    point, are integers with ``|q − zp| ≤ 255 < 2⁸`` — exact in bf16 —
    so the *bf16×s8 batched-dot* int4 kernel (the int4wo decode kernel,
    ``kernels/int4_matmul.py::_kernel_bint8``) computes the exact
    integer matmul with zero extra weight-path cost; the per-token act
    scale applies to output rows. Unlike the QDQ route this never
    materializes a dequantized bf16 activation (whose ``s·q`` products
    round in bf16), and unlike the serialized per-group int8×int8 W4A8
    kernel it keeps the batched-dot issue rate (measured 29.5 ms vs
    ~3.2 ms per 8B FFN matmul — see ``w4a8_matmul.py``).
    """
    if not _use_pallas(preference):
        return _impl_laqt_generic(x, w, bias, preference)
    from torchao_tpu.kernels.int4_matmul import int4_dq_matmul_available

    inner: IntxArray = w.original_weight
    impl = int4_dq_matmul_available(x, inner)
    quantized = w.quantize_input(x)
    if len(quantized) == 3:  # asymmetric: (q, scale, zp)
        q, scale, zp = quantized
        xc = (
            q.astype(jnp.int32) - zp.astype(jnp.int32)[..., None]
        ).astype(jnp.bfloat16)
    else:  # symmetric: (q, scale)
        q, scale = quantized
        xc = q.astype(jnp.bfloat16)
    out = impl(xc, inner)
    out = (
        out.astype(jnp.float32)
        * scale.reshape(out.shape[:-1] + (1,)).astype(jnp.float32)
    ).astype(x.dtype)
    return out + bias if bias is not None else out


register_qlinear_dispatch(
    "8da4w_centered_int4", _check_8da4w_centered, _impl_8da4w_centered
)
register_qlinear_dispatch(
    "laqt_generic", _check_laqt_generic, _impl_laqt_generic
)
register_qlinear_dispatch(
    "int8_weight_only", _check_int8_weight_only, _impl_int8_weight_only
)
register_qlinear_dispatch(
    "int4_weight_only", _check_int4_weight_only, _impl_int4_weight_only
)
register_qlinear_dispatch("fp8_weight", _check_fp8_weight, _impl_fp8_weight)


def _check_fpx_weight(x, w, bias):
    from torchao_tpu.qtypes.floatx import FloatxArray

    return isinstance(w, FloatxArray) and w.ndim == 2


def _impl_fpx_weight(x, w, bias, preference):
    """fpx weight-only: fp6 e3m2 rides the fused Pallas decode kernel
    (``kernels/fp6_matmul.py``, the reference's fp6-LLM hot path
    ``csrc/cuda/fp6_llm/fp6_linear.cu``); other widths dequantize."""
    if _use_pallas(preference):
        from torchao_tpu.kernels import fp6_matmul

        impl = fp6_matmul.fp6_dq_matmul_available(x, w)
        if impl is not None:
            out = impl(x, w)
            return out + bias if bias is not None else out
    wd = w.dequantize(x.dtype)
    out = jnp.matmul(x, wd.T)
    return out + bias if bias is not None else out


register_qlinear_dispatch("fpx_weight", _check_fpx_weight, _impl_fpx_weight)


def _check_fp6_dual(x, w, bias):
    from torchao_tpu.qtypes.floatx import Fp6DualArray

    return isinstance(w, Fp6DualArray) and w.ndim == 2


def _impl_fp6_dual(x, w, bias, preference):
    """Exact-fp6 dual-plane path: the nibble plane rides the int4
    kernel, the high plane the int8 kernel; their sum is the exact fp6
    matmul (FloatxArray.to_dual_planes)."""
    out = linear(x, w.a_plane, kernel_preference=preference) + linear(
        x, w.b_plane, kernel_preference=preference
    )
    return out + bias if bias is not None else out


register_qlinear_dispatch("fp6_dual", _check_fp6_dual, _impl_fp6_dual)
