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
