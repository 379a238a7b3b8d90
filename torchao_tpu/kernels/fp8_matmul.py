"""fp8 rowwise-scaled matmul Pallas kernel.

TPU replacement for the reference's ``torch._scaled_mm`` path
(``float8_layout.py:313-367``, ``inference.py:70-88``) and the CUTLASS fp8
rowwise kernels (SURVEY.md §2.7): e4m3 activations (per-row scale) × e4m3
weights (per-row scale), bf16 MXU compute with f32 accumulation and the
dual rowwise-scale epilogue fused. fp8 operands halve HBM traffic vs bf16;
the MXU consumes bf16 upcasts (v5e has no native fp8 MXU path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv


def _kernel(x_ref, w_ref, xs_ref, ws_ref, out_ref, acc_ref, *, n_k_blocks):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = (
            acc_ref[:] * xs_ref[:].astype(jnp.float32)
            * ws_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def fp8_rowwise_matmul(
    x_q: jnp.ndarray,      # [M, K] fp8
    w_q: jnp.ndarray,      # [N, K] fp8
    x_scale: jnp.ndarray,  # [M] / [M, 1] f32
    w_scale: jnp.ndarray,  # [N] / [N, 1] f32
    out_dtype=jnp.bfloat16,
    *,
    bm: Optional[int] = None,
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x_q.shape
    N, K2 = w_q.shape
    assert K == K2
    xs = x_scale.reshape(M, 1).astype(jnp.float32)
    ws = w_scale.reshape(1, N).astype(jnp.float32)

    bk = min(bk, K)
    while K % bk:
        bk //= 2
    bn = min(bn, N)
    if bm is None:
        bm = 32 if M <= 32 else min(256, M)
    bm = min(bm, M) if (M % 32 == 0 or M < 32) else 32

    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    nbk = K // bk
    grid = (cdiv(M, bm), cdiv(N, bn), nbk)
    kernel = functools.partial(_kernel, n_k_blocks=nbk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + N * K + M * N * 2,
            transcendentals=0,
        ),
    )(x_q, w_q, xs, ws)


def fp8_rowwise_matmul_reference(x_q, w_q, x_scale, w_scale,
                                 out_dtype=jnp.bfloat16):
    acc = jax.lax.dot_general(
        x_q.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (
        acc * x_scale.reshape(-1, 1).astype(jnp.float32)
        * w_scale.reshape(1, -1).astype(jnp.float32)
    )
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Stacked mixed-dot fp8 kernel (decode hot path).
#
# Probed on hw (scripts/fp8_cast_probe.py): e4m3->bf16 and e4m3->f32
# casts are Mosaic-legal and exact, and a DIRECT bf16-lhs x e4m3-rhs
# dot_general is native+exact on the MXU — so fp8 weights stream to the
# MXU with zero cast work, exactly like the int8wo mixed kernel. The
# weight side carries a scalar-prefetched stacked-layer axis so decode
# under lax.scan never materializes a per-layer slice (the ~40%-of-step
# copy pathology — see int4_matmul._kernel_bint8). Replaces the
# reference's torch._scaled_mm hot path for decode
# (``float8_layout.py:329-367``).
# ---------------------------------------------------------------------------


def _mixed_kernel(l_ref, x_ref, w_ref, xs_ref, ws_ref, out_ref, acc_ref,
                  *, n_k_blocks):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lhs = x_ref[:]
    if lhs.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # fp8dq: e4m3 activations upcast in VMEM (M rows — tiny);
        # products of two fp8 values are exact in bf16xbf16->f32
        lhs = lhs.astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        lhs, w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = (
            acc_ref[:]
            * xs_ref[:].astype(jnp.float32)
            * ws_ref[0].astype(jnp.float32)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"),
)
def fp8_mixed_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32 (fp8wo) or e4m3 (fp8dq)
    w_q: jnp.ndarray,      # [(L,) N, K] e4m3
    w_scale: jnp.ndarray,  # [(L,) N] or [(L,) 1] f32
    x_scale: Optional[jnp.ndarray] = None,  # [M] f32 (fp8dq act scales)
    out_dtype=jnp.bfloat16,
    *,
    bm: Optional[int] = None,
    bn: int = 1024,
    bk: int = 2048,
    interpret: bool = False,
    layer_idx=None,
) -> jnp.ndarray:
    """out = (x · dq(w).T) with rowwise/tensorwise weight scales and
    optional per-row activation scales fused into the epilogue."""
    M, K = x.shape
    if layer_idx is None:
        w_q = w_q[None]
        w_scale = w_scale.reshape(1, -1)
        layer_idx = 0
    L, N, K2 = w_q.shape
    assert K == K2, (K, K2)
    ws = jnp.broadcast_to(
        w_scale.reshape(L, 1, -1).astype(jnp.float32), (L, 1, N)
    )
    xs = (
        jnp.ones((M, 1), jnp.float32) if x_scale is None
        # per-row [M] or per-tensor [1] activation scales
        else jnp.broadcast_to(
            x_scale.astype(jnp.float32).reshape(-1, 1), (M, 1)
        )
    )

    bn = min(bn, N)
    bk = min(bk, K)
    # a PARTIAL trailing K block reads out-of-bounds pad (undefined on
    # hardware) into the shared accumulation — halve bk until it divides
    # (partial M/N blocks only garbage clipped pad rows/cols; K must not)
    while K % bk:
        bk //= 2
    if bm is None:
        bm = 8 if M <= 8 else min(256, M)
    bm = min(bm, M) if (M % 8 == 0 or M < 8) else 8
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    nbk = cdiv(K, bk)
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cdiv(M, bm), cdiv(N, bn), nbk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((1, bn, bk), lambda i, j, k, l: (l[0], j, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k, l: (i, 0)),
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_mixed_kernel, n_k_blocks=nbk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + M * K * 2 + M * N * 2,
            transcendentals=0,
        ),
    )(lvec, x, w_q, xs, ws)


def fp8_mixed_matmul_available(x, w, layer_idx=None):
    """Probe for the stacked/mixed fp8 decode path: e4m3 Float8Array
    with per-row or per-tensor scales, aligned shapes. ``x`` is the
    HIGH-PRECISION activation (act quant, if any, happens in the impl)."""
    import os

    from torchao_tpu.qtypes.float8 import (
        Float8Array,
        quantize_activation_float8,
    )

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_FP8") == "1":
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    stacked = layer_idx is not None
    if not isinstance(w, Float8Array):
        return None
    if w.qdata.ndim != (3 if stacked else 2):
        return None
    if w.float8_dtype != "float8_e4m3fn":
        return None
    L = w.qdata.shape[0] if stacked else 1
    N, K = w.qdata.shape[-2:]
    if N % 128 != 0 or K % 128 != 0:
        return None
    if w.scale.size not in (L, L * N):
        return None
    spec = w.act_quant_spec
    if spec is not None and spec.granularity not in (
        "per_row", "per_tensor"
    ):
        return None

    def impl(x, w_arr):
        xb = x.reshape(-1, K)
        ws = w_arr.scale.astype(jnp.float32)
        ws = ws.reshape(L, -1) if stacked else ws.reshape(-1)
        if w_arr.act_quant_spec is None:
            x_in, xs = xb, None
        else:
            x_q, x_scale = quantize_activation_float8(
                xb, w_arr.act_quant_spec
            )
            x_in, xs = x_q, x_scale.reshape(-1)
        out = fp8_mixed_matmul(
            x_in, w_arr.qdata, ws, xs,
            out_dtype=x.dtype, layer_idx=layer_idx,
        )
        return out.reshape(x.shape[:-1] + (N,))

    return impl


def fp8_rowwise_matmul_available(x_q, w):
    from torchao_tpu.qtypes.float8 import Float8Array

    import os

    # OFF by default: measured on v5e (no native fp8 arithmetic) the XLA
    # dequant path decodes Llama-3-8B fp8dq at 69.9 tok/s / 525 GB/s vs
    # 8.2 tok/s through this kernel — XLA's e4m3→bf16 convert lowering
    # beats the kernel's 8.5×. Opt back in with
    # TORCHAO_TPU_ENABLE_PALLAS_FP8=1 (e.g. on hardware with native fp8).
    if os.environ.get("TORCHAO_TPU_ENABLE_PALLAS_FP8") != "1":
        return None
    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_FP8") == "1":
        return None
    if not isinstance(w, Float8Array) or w.qdata.ndim != 2:
        return None
    N, K = w.qdata.shape
    if K % 128 != 0 or N % 128 != 0:
        return None
    # rowwise weight scale only ([N] / [N,1]); per-tensor handled by XLA
    if w.scale.size != N:
        return None
    spec = w.act_quant_spec
    if spec is not None and spec.granularity != "per_row":
        return None

    def impl(x_q_in, x_scale, w_arr, out_hp_dtype):
        x2 = x_q_in.reshape(-1, K)
        out = fp8_rowwise_matmul(
            x2, w_arr.qdata, x_scale.reshape(-1),
            w_arr.scale.reshape(-1), out_dtype=out_hp_dtype,
        )
        return out.reshape(x_q_in.shape[:-1] + (N,))

    return impl
