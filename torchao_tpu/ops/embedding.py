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
            groupwise = scale.ndim == 2 and scale.shape[-1] > 1
            if groupwise:
                # [.., E] → [.., G, g]: per-group qparams broadcast on
                # the trailing group axis
                g = weight.block_size[-1]
                out = q_rows.astype(jnp.float32).reshape(
                    *q_rows.shape[:-1], -1, g
                )
                s_rows = scale[ids][..., None].astype(jnp.float32)
                z_rows = (
                    zp[ids][..., None].astype(jnp.float32)
                    if zp is not None else None
                )
            else:
                # per-row qparams ([V] or [V, 1])
                out = q_rows.astype(jnp.float32)
                s_rows = scale[ids]
                while s_rows.ndim < out.ndim:
                    s_rows = s_rows[..., None]
                s_rows = s_rows.astype(jnp.float32)
                z_rows = None
                if zp is not None:
                    z_rows = zp[ids]
                    while z_rows.ndim < out.ndim:
                        z_rows = z_rows[..., None]
                    z_rows = z_rows.astype(jnp.float32)
            if z_rows is not None:
                if weight.zero_point_domain is ZeroPointDomain.INT:
                    out = (out - z_rows) * s_rows
                else:  # FLOAT domain: dq = (q − mid)·s + z
                    mid = (weight.quant_max + weight.quant_min + 1) / 2
                    out = (out - mid) * s_rows + z_rows
            else:
                out = out * s_rows
            if groupwise:
                out = out.reshape(q_rows.shape)
            return out.astype(weight.dtype)
    # generic fallback: dequantize whole table (correct, memory-heavy)
    return weight.dequantize()[ids]
