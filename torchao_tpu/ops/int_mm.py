"""Integer matmul public ops.

Covers the reference's ``torchao.kernel`` exports ``safe_int_mm``
(``kernel/intmm.py``: int8×int8→int32 with fallback guards for shapes
cuBLAS rejects) and ``int_scaled_matmul`` (same + row scales). On TPU
there are no shape-legality traps — XLA pads and tiles for the MXU —
so both are direct ``dot_general`` lowerings with int32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_int_mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """int8 ``a [M, K] @ b [K, N] → int32`` (reference
    ``torchao.kernel.safe_int_mm``)."""
    assert a.dtype == jnp.int8 and b.dtype == jnp.int8, (a.dtype, b.dtype)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def int_scaled_matmul(
    a: jnp.ndarray, b: jnp.ndarray, scales1: jnp.ndarray
) -> jnp.ndarray:
    """``(a @ b) * scales1`` with int8 operands and per-row ``scales1
    [M, 1]`` (reference ``torchao.kernel.int_scaled_matmul``)."""
    acc = safe_int_mm(a, b)
    return acc.astype(scales1.dtype) * scales1
