"""Manual tensor parallelism via ``shard_map`` — the Pallas-kernel TP
path (VERDICT r3 #3).

GSPMD auto-partitioning cannot split a Mosaic custom call ("Mosaic
kernels cannot be automatically partitioned"), so the NamedSharding +
jit TP path silently requires the XLA fallback kernels on TPU. The
production multi-chip decode instead wraps the forward in ``shard_map``:
every device runs the UNMODIFIED single-chip model — stacked-layer scan,
scalar-prefetch Pallas kernels, quantized KV attention — on its local
shard shapes, and the model itself inserts the canonical Megatron
collectives (``ModelArgs.tp_axis``: psum after the row-parallel wo/w2,
vocab all-gather after the column-parallel head).

Key pieces:
- :func:`tp_local_args` — the per-device ModelArgs (heads, KV heads and
  FFN width ÷ m; ``head_dim``/``dim`` unchanged).
- :func:`localize_quantized_metadata` — shard_map slices array leaves
  but static pytree metadata still describes the GLOBAL array; this
  rebuilds ``logical_shape`` from the local leaf shapes (the shard
  analog of ``QuantizedArray.unstack_layer``).
- :func:`make_tp_decode_step` — the jitted shard_map decode step over a
  mesh ``model`` axis, consuming the SAME sharded params/cache the
  GSPMD path uses (``shard_params`` + ``kv_cache_specs`` +
  ``interleave_qkv_params`` — the device-major interleave makes each
  wqkv shard exactly the local model's fused [q|k|v] layout).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchao_tpu.qtypes.base import PackingFormat, QuantizedArray
from torchao_tpu.parallel.sharding import (
    kv_cache_specs,
    llama_param_specs,
)


def tp_local_args(args, m: int, axis: str = "model"):
    """Per-device ModelArgs for m-way TP: heads, KV heads and FFN width
    divide by m; ``dim`` (and therefore ``head_dim``) stay global."""
    assert args.n_head % m == 0, (args.n_head, m)
    assert args.n_local_heads % m == 0, (args.n_local_heads, m)
    assert args.intermediate_size % m == 0, (args.intermediate_size, m)
    la = dataclasses.replace(
        args,
        n_head=args.n_head // m,
        n_local_heads=args.n_local_heads // m,
        intermediate_size=args.intermediate_size // m,
        qkv_device_blocks=1,
        ffn_device_blocks=1,
        tp_axis=axis,
    )
    # __post_init__ recomputed head_dim = dim / n_head_local — undo: the
    # local model keeps the global head geometry, just fewer heads
    la.head_dim = args.head_dim
    return la


def _relocalized(w: QuantizedArray) -> QuantizedArray:
    """Rebuild ``logical_shape`` from the (locally sliced) leaf shapes."""
    ls = getattr(w, "logical_shape", None)
    qd = getattr(w, "qdata", None)
    if ls is None or qd is None or not hasattr(qd, "shape"):
        return w
    lead = tuple(qd.shape[: max(0, len(ls) - 2)])
    if w.packing_format is PackingFormat.TILED_NIBBLES:
        # K-major storage [.., K/2, N] → logical [.., N, K]
        local = lead + (qd.shape[-1], qd.shape[-2] * 2)
    elif qd.ndim >= 2:
        local = lead + tuple(qd.shape[-2:])
    else:
        return w
    if tuple(ls) == local:
        return w
    return dataclasses.replace(w, logical_shape=local)


def localize_quantized_metadata(params: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda l: _relocalized(l) if isinstance(l, QuantizedArray) else l,
        params,
        is_leaf=lambda x: isinstance(x, QuantizedArray),
    )


def repack_rowwise_for_tp(w: Any, m: int) -> Any:
    """Re-pack a ROW-PARALLEL (K-sharded) TILED_NIBBLES weight so every
    K-shard is a self-consistent half-split packing.

    The global packing pairs logical elements (k, k + K/2) in one byte,
    so a contiguous byte-row shard holds element pairs that span distant
    K blocks — a local kernel reading it as "half-split over MY K" gets
    the wrong elements (this is why K-sharding cannot just slice the
    packed array). Repacking per device block makes byte row j of block
    d hold elements (d·K/m + j, d·K/m + j + K/2m); the kernel-form
    qparams are recomputed per block (the lo/hi family split moves with
    the halves). Scale/zero rows are logical-K-ordered and contiguous
    per block, so they shard unchanged. The result is ONLY valid for
    the shard_map path (each shard is a standard local TILED weight);
    the GSPMD path keeps the global packing."""
    from torchao_tpu.qtypes.intx import IntxArray, _tiled_eff_qparams
    from torchao_tpu.qtypes.packing import pack_int4, unpack_int4

    if (
        not isinstance(w, IntxArray)
        or w.packing_format is not PackingFormat.TILED_NIBBLES
        or m <= 1
    ):
        return w
    qd = w.qdata
    if w.nibbles_xored:
        qd = qd ^ jnp.uint8(0x80)
    q = unpack_int4(jnp.swapaxes(qd, -1, -2), axis=-1)  # [.., N, K]
    K = q.shape[-1]
    g = w.block_size[-1]
    assert K % m == 0 and (K // m) % (2 * g) == 0, (K, m, g)
    Kb = K // m
    nGb2 = Kb // g  # scale rows (groups) per block
    parts, effs = [], []
    for d in range(m):
        blk = q[..., d * Kb:(d + 1) * Kb]
        parts.append(jnp.swapaxes(pack_int4(blk, axis=-1), -1, -2))
        s_blk = w.scale[..., d * nGb2:(d + 1) * nGb2, :]
        z_blk = (
            w.zero_point[..., d * nGb2:(d + 1) * nGb2, :]
            if w.zero_point is not None else None
        )
        effs.append(
            _tiled_eff_qparams(
                s_blk, z_blk, w.quant_min, w.quant_max,
                w.zero_point_domain,
            )
        )
    qdata = jnp.concatenate(parts, axis=-2)
    if w.nibbles_xored:
        qdata = qdata ^ jnp.uint8(0x80)
    qeff = (
        jnp.concatenate(effs, axis=-2).astype(jnp.bfloat16)
        if effs[0] is not None else None
    )
    return dataclasses.replace(
        w, qdata=qdata, qparams_eff=qeff, qparams_eff_chunk=None
    )


def prepare_tp_params_shardmap(params: Any, args, m: int) -> Any:
    """Full param prep for the shard_map TP path: device-major
    interleaves (wqkv + w13, as the GSPMD path) PLUS per-block repack of
    the row-parallel quantized weights (wo, w2)."""
    from torchao_tpu.parallel.sharding import prepare_tp_params

    params = prepare_tp_params(params, args, m)
    out = dict(params)
    out["layers"] = dict(params["layers"])
    att = dict(out["layers"]["attention"])
    att["wo"] = repack_rowwise_for_tp(att["wo"], m)
    out["layers"]["attention"] = att
    ff = dict(out["layers"]["feed_forward"])
    ff["w2"] = repack_rowwise_for_tp(ff["w2"], m)
    out["layers"]["feed_forward"] = ff
    return out


def _spec_tree(shardings: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: s.spec if isinstance(s, NamedSharding) else P(),
        shardings,
        is_leaf=lambda s: isinstance(s, (NamedSharding, P)),
    )


def make_tp_decode_step(
    model,
    mesh: Mesh,
    axis: str = "model",
    data_axis: str = "data",
):
    """Build ``step(params, tokens, input_pos, cache) -> (logits, cache)``
    running the full Pallas decode per-shard under shard_map.

    ``params``/``cache`` are the GLOBAL sharded pytrees (placed with
    ``shard_params`` / ``kv_cache_specs``); ``interleave_qkv_params``
    must have been applied with ``n_blocks = mesh.shape[axis]``."""
    from torchao_tpu.models.llama.model import Transformer

    m = mesh.shape[axis]
    largs = tp_local_args(model.args, m, axis=axis)
    lmodel = Transformer(largs, model.dtype)

    def local_step(p, tok, pos, cache):
        p = localize_quantized_metadata(p)
        logits, cache = lmodel(p, tok, pos, cache)
        return logits, cache

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    import inspect

    _sm_params = inspect.signature(shard_map).parameters
    _check_kw = (
        {"check_vma": False} if "check_vma" in _sm_params
        else {"check_rep": False}
    )

    def step(params, tokens, input_pos, cache):
        pspecs = _spec_tree(llama_param_specs(params, mesh, axis))
        cspecs = _spec_tree(kv_cache_specs(cache, mesh, data_axis, axis))
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(pspecs, P(data_axis), P(), cspecs),
            out_specs=(P(data_axis), cspecs),
            **_check_kw,
        )
        return fn(
            params, tokens, jnp.asarray(input_pos, jnp.int32), cache
        )

    return step
