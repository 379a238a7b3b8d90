"""int8×int8 scaled matmul Pallas kernel.

TPU replacement for the reference's ``safe_int_mm`` / ``int_scaled_matmul``
(``torchao/kernel/intmm.py:30,108``, Triton ``intmm_triton.py``) and the
cuBLAS int8 path behind ``_linear_int8_act_int8_weight_impl``
(``plain_layout.py:281-315``): int8 activations (per-token scales) ×
int8 weights (per-channel scales) accumulated in int32 on the MXU, scale
epilogue fused.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchao_tpu.utils import cdiv


def _kernel(l_ref, x_ref, w_ref, xs_ref, ws_ref, out_ref, acc_ref,
            *, n_k_blocks):
    # weight-side operands carry a leading stacked-layer axis addressed
    # by the scalar-prefetched l_ref (see int4_matmul._kernel_bint8)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = (
            acc_ref[:].astype(jnp.float32)
            * xs_ref[:].astype(jnp.float32)
            * ws_ref[0].astype(jnp.float32)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def int8_scaled_matmul(
    x_q: jnp.ndarray,      # [M, K] int8
    w_q: jnp.ndarray,      # [(L,) N, K] int8
    x_scale: jnp.ndarray,  # [M] or [M, 1]
    w_scale: jnp.ndarray,  # [(L,) N] (any shape of that size)
    out_dtype=jnp.bfloat16,
    *,
    bm: Optional[int] = None,
    bn: int = 1024,
    bk: int = 2048,
    interpret: bool = False,
    layer_idx=None,
) -> jnp.ndarray:
    # block defaults match the int8wo kernel: fewer grid steps matter
    # more than block locality on this platform (per-step overhead
    # dominates streaming kernels — PERF.md attention finding)
    """out = (x_q @ w_q.T) * x_scale[:, None] * w_scale[None, :].

    ``layer_idx``: stacked weights, scalar-prefetch layer indexing
    (zero-copy under ``lax.scan`` — see int4_matmul)."""
    M, K = x_q.shape
    if layer_idx is None:
        w_q = w_q[None]
        layer_idx = 0
    L, N, K2 = w_q.shape
    assert K == K2, (K, K2)
    xs = x_scale.reshape(M, 1).astype(jnp.float32)
    ws = w_scale.reshape(L, 1, N).astype(jnp.float32)

    bk = min(bk, K)
    while K % bk:
        bk //= 2
    bn = min(bn, N)
    if bm is None:
        bm = 32 if M <= 32 else min(256, M)
    bm = min(bm, M) if (M % 32 == 0 or M < 32) else 32

    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    nbk = K // bk
    lvec = jnp.atleast_1d(jnp.asarray(layer_idx, jnp.int32))
    kernel = functools.partial(_kernel, n_k_blocks=nbk)
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
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + N * K + M * N * 2,
            transcendentals=0,
        ),
    )(lvec, x_q, w_q, xs, ws)


def int8_scaled_matmul_reference(x_q, w_q, x_scale, w_scale,
                                 out_dtype=jnp.bfloat16):
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (
        acc.astype(jnp.float32)
        * x_scale.reshape(-1, 1).astype(jnp.float32)
        * w_scale.reshape(1, -1).astype(jnp.float32)
    )
    return out.astype(out_dtype)


def int8_scaled_matmul_available(x_q, w, layer_idx=None):
    """Probe for the int8dq dispatch (LinearActivationQuantizedArray path).

    ``w`` is the inner IntxArray (int8, per-channel symmetric, PLAIN)."""
    from torchao_tpu.qtypes.intx import IntxArray

    import os

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_INT8") == "1":
        return None
    stacked = layer_idx is not None
    if not isinstance(w, IntxArray) or w.qdata.ndim != (3 if stacked else 2):
        return None
    N, K = w.qdata.shape[-2:]
    if K % 128 != 0 or N % 128 != 0:
        return None
    if w.scale.size != N * (w.qdata.shape[0] if stacked else 1):
        return None

    def impl(x_q_in, x_scale, w_arr, out_hp_dtype):
        x2 = x_q_in.reshape(-1, K)
        w_scale = w_arr.scale.reshape(-1, N) if stacked \
            else w_arr.scale.reshape(-1)
        from torchao_tpu.kernels.autotune import (
            int8_matmul_candidates,
            lookup_or_tune,
        )

        kw = lookup_or_tune(
            "int8_scaled_matmul",
            (x2.shape[0], N, K),
            int8_matmul_candidates(x2.shape[0], N, K),
            lambda cfg, xi: int8_scaled_matmul(
                xi, w_arr.qdata, x_scale.reshape(-1), w_scale,
                out_dtype=out_hp_dtype, layer_idx=layer_idx, **cfg,
            ),
            example_x=x2,
        ) or {}
        out = int8_scaled_matmul(
            x2, w_arr.qdata, x_scale.reshape(-1), w_scale,
            out_dtype=out_hp_dtype, layer_idx=layer_idx, **kw,
        )
        return out.reshape(x_q_in.shape[:-1] + (N,))

    return impl


# ---------------------------------------------------------------------------
# int8 WEIGHT-ONLY: bf16 activations × int8 weights via the native mixed
# MXU matmul (probed on hw: bf16×s8 dot_general is legal and exact) —
# no weight cast materializes; per-channel scale in the epilogue.
# ---------------------------------------------------------------------------


def _wo_kernel(l_ref, x_ref, w_ref, ws_ref, out_ref, acc_ref,
               *, n_k_blocks):
    # weight operands carry a leading stacked-layer axis addressed by
    # the scalar-prefetched l_ref in the BlockSpec index maps — a
    # sliced operand cannot fuse into a Pallas call and would copy the
    # full weight per lax.scan step (see int4_matmul._kernel_bint8)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_blocks - 1)
    def _():
        out_ref[:] = (
            acc_ref[:] * ws_ref[0].astype(jnp.float32)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret")
)
def int8wo_mixed_matmul(
    x: jnp.ndarray,        # [M, K] bf16/f32
    w_q: jnp.ndarray,      # [(L,) N, K] int8
    w_scale: jnp.ndarray,  # [(L,) N]
    *,
    bm: Optional[int] = None,
    bn: int = 1024,
    bk: int = 2048,
    interpret: bool = False,
    layer_idx=None,
) -> jnp.ndarray:
    M, K = x.shape
    if layer_idx is None:
        w_q = w_q[None]
        w_scale = w_scale.reshape(1, -1)
        layer_idx = 0
    L, N, K2 = w_q.shape
    assert K == K2, (K, K2)
    bn = min(bn, N)
    bk = min(bk, K)
    # a PARTIAL trailing K block reads out-of-bounds pad (undefined on
    # hardware) into the shared accumulation — halve bk until it divides
    # (same rule as int8_scaled_matmul; partial M/N blocks are harmless:
    # their garbage lands only in clipped pad rows/cols)
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
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_wo_kernel, n_k_blocks=nbk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + M * K * 2 + N * 4,
            transcendentals=0,
        ),
    )(lvec, x, w_q, w_scale.reshape(L, 1, N))
    return out


def int8wo_mixed_matmul_available(x, w, layer_idx=None):
    """Probe: PLAIN int8 2-D weight with per-channel scales, aligned."""
    import os

    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray

    if os.environ.get("TORCHAO_TPU_DISABLE_PALLAS_INT8WO") == "1":
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    stacked = layer_idx is not None
    if not isinstance(w, IntxArray) or w.qdata.ndim != (3 if stacked else 2):
        return None
    if w.packing_format is not PackingFormat.PLAIN:
        return None
    if str(w.qdata.dtype) != "int8":
        return None
    N, K = w.qdata.shape[-2:]
    if N % 128 != 0 or K % 128 != 0:
        return None
    if w.scale.size != N * (w.qdata.shape[0] if stacked else 1):
        return None

    def impl(x, w):
        xb = x.reshape(-1, K)
        ws = w.scale.astype(jnp.float32)
        ws = ws.reshape(-1, N) if stacked else ws.reshape(-1)
        out = int8wo_mixed_matmul(
            xb, w.qdata, ws, layer_idx=layer_idx
        )
        return out.reshape(x.shape[:-1] + (N,))

    return impl
