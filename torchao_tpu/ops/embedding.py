"""Quantized embedding lookup.

Covers the reference's embedding quantization (``embed-int8wo`` recipe,
``quant_api.py`` embedding handling + ``experimental`` embedding_xbit
ops): gather the quantized rows and dequantize only those rows — the
lookup touches int8 bytes + one scale per row, not a dequantized table.
"""

from __future__ import annotations

import jax.numpy as jnp

from torchao_tpu.qtypes.base import QuantizedArray
from torchao_tpu.qtypes.intx import IntxArray
from torchao_tpu.quantization.quant_primitives import ZeroPointDomain


def embedding(weight, ids: jnp.ndarray) -> jnp.ndarray:
    """``weight[ids]`` for plain or quantized embedding tables."""
    if not isinstance(weight, QuantizedArray):
        return weight[ids]
    from torchao_tpu.quantization.qat.api import QATFakeQuantizedArray

    if isinstance(weight, QATFakeQuantizedArray):
        # embedding QAT (reference qat/embedding.py): fake-quantize the
        # table, gather rows — STE gradients flow into the hp table
        return weight.fake_quantized_weight()[ids]
    if isinstance(weight, IntxArray) and weight.qdata.ndim == 2:
        from torchao_tpu.qtypes.base import PackingFormat

        if weight.packing_format is PackingFormat.PLAIN:
            q_rows = weight.qdata[ids]
            scale = weight.scale
            zp = weight.zero_point
            # per-row qparams ([V] or [V, k_groups])
            s_rows = scale[ids]
            while s_rows.ndim < q_rows.ndim:
                s_rows = s_rows[..., None]
            out = q_rows.astype(jnp.float32)
            if zp is not None and weight.zero_point_domain is ZeroPointDomain.INT:
                z_rows = zp[ids]
                while z_rows.ndim < q_rows.ndim:
                    z_rows = z_rows[..., None]
                out = out - z_rows.astype(jnp.float32)
            out = out * s_rows.astype(jnp.float32)
            # group-wise scales need interleaved expansion instead
            if scale.ndim == 2 and scale.shape[-1] > 1:
                g = weight.block_size[-1]
                out = q_rows.astype(jnp.float32).reshape(
                    *q_rows.shape[:-1], -1, g
                )
                s_rows = scale[ids][..., None].astype(jnp.float32)
                if zp is not None:
                    z_rows = zp[ids][..., None].astype(jnp.float32)
                    out = out - z_rows
                out = (out * s_rows).reshape(q_rows.shape)
            return out.astype(weight.dtype)
    # generic fallback: dequantize whole table (correct, memory-heavy)
    return weight.dequantize()[ids]
