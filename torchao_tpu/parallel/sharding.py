"""Mesh + sharding rules for quantized model pytrees.

The reference achieves TP by making tensor subclasses DTensor-shardable
(slice/view ops, ``affine_quantized_tensor_ops.py:467-598``) and lets
torch.distributed place them. TPU-natively, quantized arrays are already
pytrees, so sharding is just a matching pytree of ``NamedSharding``s; the
work is the *rules* (SURVEY.md §2.10): qdata shards like the weight it
quantizes, rowwise scales shard with rows, group scales shard with their
K-blocks, per-tensor scales replicate.

Llama TP layout (megatron-style, over the ``model`` mesh axis):
  - wqkv, w13: column-parallel (output features sharded)
  - wo, w2: row-parallel (input features sharded; XLA inserts the psum)
  - embeddings/norms: replicated;  output head: vocab-sharded
  - KV cache: heads sharded on ``model``, batch on ``data``
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Dict[str, int], devices=None
) -> Mesh:
    """e.g. ``make_mesh({"data": 2, "model": 4})``."""
    if devices is None:
        devices = jax.devices()
    names = tuple(mesh_shape.keys())
    shape = tuple(mesh_shape.values())
    n = int(np.prod(shape))
    assert len(devices) >= n, (len(devices), n)
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, names)


# base PartitionSpecs for stacked-layer Llama weights ([L, out, in])
def _llama_weight_specs(model_axis: str) -> Dict[str, P]:
    m = model_axis
    return {
        "tok_embeddings.weight": P(None, None),
        "layers.attention.wqkv": P(None, m, None),     # column-parallel
        "layers.attention.wo": P(None, None, m),       # row-parallel
        "layers.feed_forward.w13": P(None, m, None),
        "layers.feed_forward.w2": P(None, None, m),
        "layers.attention_norm.weight": P(None, None),
        "layers.ffn_norm.weight": P(None, None),
        "norm.weight": P(None),
        "output.weight": P(m, None),
    }


def _spec_for_leaf(base: P, leaf, transposed: bool = False) -> P:
    """Project a weight's PartitionSpec onto one of its quantized leaves.

    All integrated quant schemes reduce over *trailing* dims, so a
    lower-rank qparam leaf (per-channel scale) keeps the leading entries of
    the weight spec; equal-rank leaves (group scales, packed qdata) keep
    the full spec. ``transposed`` handles K-major storage (TILED_NIBBLES:
    leaves are [..., K', N], so the last two spec entries swap).
    """
    ndim = getattr(leaf, "ndim", None)
    if ndim is None:
        return base
    entries = list(base) + [None] * max(0, ndim - len(tuple(base)))
    if transposed and len(entries) >= 2:
        entries[-1], entries[-2] = entries[-2], entries[-1]
    return P(*entries[:ndim])


def param_shardings(
    params: Any, base_specs: Dict[str, P], mesh: Mesh
) -> Any:
    """Generic version of :func:`llama_param_specs`: map *logical*
    weight PartitionSpecs (path-prefix keyed) onto every leaf of a
    (possibly quantized) params pytree — qdata shards like its weight
    (axes swapped for K-major storage), scales/zeros follow their
    reduction axes."""
    return _specs_from_map(params, base_specs, mesh)


def llama_param_specs(
    params: Any, mesh: Mesh, model_axis: str = "model"
) -> Any:
    """Pytree of NamedSharding matching ``params`` (quantized or not)."""
    return _specs_from_map(params, _llama_weight_specs(model_axis), mesh)


def _specs_from_map(
    params: Any, base_specs: Dict[str, P], mesh: Mesh
) -> Any:

    def path_str(key_path):
        parts = []
        for k in key_path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        return ".".join(parts)

    from torchao_tpu.qtypes.base import PackingFormat
    from torchao_tpu.qtypes.intx import IntxArray

    def spec_of(key_path, leaf):
        path = path_str(key_path)
        base = None
        for prefix, spec in base_specs.items():
            if path.startswith(prefix):
                base = spec
                break
        if base is None:
            base = P()
        # K-major (transposed) storage: TILED_NIBBLES IntxArray leaves
        transposed = (
            ".qdata" in path or ".scale" in path
            or ".zero_point" in path or ".qparams_eff" in path
        )
        if transposed:
            # only actually swapped when the owning array is K-major; find
            # the owning packing format by re-walking the params path
            transposed = _is_tiled_kmajor(params, key_path)
        return NamedSharding(
            mesh, _spec_for_leaf(base, leaf, transposed=transposed)
        )

    def _is_tiled_kmajor(root, key_path):
        node = root
        for k in key_path:
            if isinstance(node, IntxArray):
                return node.packing_format is PackingFormat.TILED_NIBBLES
            if hasattr(k, "key"):
                node = node[k.key]
            elif hasattr(k, "name"):
                node = getattr(node, k.name)
            elif hasattr(k, "idx"):
                node = node[k.idx]
            else:
                return False
        return (
            isinstance(node, IntxArray)
            and node.packing_format is PackingFormat.TILED_NIBBLES
        )

    return jax.tree_util.tree_map_with_path(spec_of, params)


def kv_cache_specs(
    cache: Any, mesh: Mesh, data_axis: str = "data",
    model_axis: str = "model",
) -> Any:
    """KV-cache shardings: batch on ``data``, heads on ``model``
    (sequence dim replicated — decode-dominant serving; SP is an
    explicit non-goal for parity, SURVEY.md §5).

    Supports both layouts:
    - head-major [L, B, Hkv, S, Dh(or 1)] (bf16 / "int8_hmajor" / int4
      packed): heads at dim 2.
    - split-flat smajor (the int8 default): K [L, B, Hkv·Dh, S] and
      V [L, B, S, Hkv·Dh] shard their flat head dim; scales
      [L, B, Hkv, S] shard dim 2. The flat Hkv·Dh dim shards cleanly on
      ``model`` because Hkv is the outer factor of the flattening
      (device d's shard = heads [d·Hkv/m, (d+1)·Hkv/m), matching the
      head-sharded q/k/v projections).
    """

    def spec_of(key_path, leaf):
        name = ""
        for k in key_path:
            if hasattr(k, "key"):
                name = str(k.key)
        if leaf.ndim == 5:  # head-major [L, B, Hkv, S, Dh|1]
            return NamedSharding(
                mesh, P(None, data_axis, model_axis, None, None)
            )
        if leaf.ndim == 4 and name == "k_q":   # [L, B, Hkv·Dh, S]
            return NamedSharding(
                mesh, P(None, data_axis, model_axis, None)
            )
        if leaf.ndim == 4 and name == "v_q":   # [L, B, S, Hkv·Dh]
            return NamedSharding(
                mesh, P(None, data_axis, None, model_axis)
            )
        if leaf.ndim == 4:                     # scales [L, B, Hkv, S]
            return NamedSharding(
                mesh, P(None, data_axis, model_axis, None)
            )
        raise ValueError(f"unexpected cache leaf {name}: {leaf.shape}")

    return jax.tree_util.tree_map_with_path(spec_of, cache)


def shard_params(
    params: Any, mesh: Mesh, model_axis: str = "model"
) -> Any:
    """device_put params with the Llama TP rules."""
    return jax.device_put(params, llama_param_specs(params, mesh, model_axis))


def _slice_out_features(leaf, start: int, size: int):
    if hasattr(leaf, "slice_out_features"):
        return leaf.slice_out_features(start, size)
    if hasattr(leaf, "original_weight"):  # composition wrappers
        import dataclasses

        return dataclasses.replace(
            leaf,
            original_weight=_slice_out_features(
                leaf.original_weight, start, size
            ),
        )
    return leaf[..., start:start + size, :]


def _concat_out_features(parts):
    import jax.numpy as jnp

    a = parts[0]
    if hasattr(a, "concat_out_features"):
        return type(a).concat_out_features(parts)
    if hasattr(a, "original_weight"):
        import dataclasses

        return dataclasses.replace(
            a,
            original_weight=_concat_out_features(
                [p.original_weight for p in parts]
            ),
        )
    return jnp.concatenate(parts, axis=-2)


def interleave_qkv_params(params: Any, args, n_blocks: int) -> Any:
    """Reorder the fused wqkv out-features DEVICE-MAJOR for aligned TP.

    The fused projection concatenates sections of widths
    (H·Dh, Hkv·Dh, Hkv·Dh); sharding that axis into ``n_blocks`` equal
    shards puts section boundaries inside shards, and GSPMD then
    reshards q/k/v on EVERY step (weight all-to-alls + activation
    permutes in the compiled decode — found by
    ``parallel.evidence.tp_decode_evidence``). This permutes rows so
    block ``d`` holds ``[q_d | k_d | v_d]`` (each section's d-th
    head-aligned slice): every shard boundary coincides with a block
    boundary and the model's per-block split
    (``ModelArgs.qkv_device_blocks = n_blocks``) is shard-local.
    Head order inside q/k/v is unchanged, so the KV cache layout, RoPE,
    GQA grouping and wo are untouched."""
    H, Hkv, Dh = args.n_head, args.n_local_heads, args.head_dim
    assert H % n_blocks == 0 and Hkv % n_blocks == 0, (H, Hkv, n_blocks)
    qd, kd = H * Dh, Hkv * Dh
    qpd, kpd = qd // n_blocks, kd // n_blocks
    w = params["layers"]["attention"]["wqkv"]
    parts = []
    for d in range(n_blocks):
        parts.append(_slice_out_features(w, d * qpd, qpd))
        parts.append(_slice_out_features(w, qd + d * kpd, kpd))
        parts.append(_slice_out_features(w, qd + kd + d * kpd, kpd))
    out = dict(params)
    out["layers"] = dict(params["layers"])
    out["layers"]["attention"] = dict(params["layers"]["attention"])
    out["layers"]["attention"]["wqkv"] = _concat_out_features(parts)
    return out


def interleave_w13_params(params: Any, args, n_blocks: int) -> Any:
    """Reorder the merged w13 out-features DEVICE-MAJOR for aligned TP —
    the FFN counterpart of :func:`interleave_qkv_params`. The merged
    projection stacks [w1 (I rows); w3 (I rows)]; sharding that axis
    into ``n_blocks`` gives shards holding only-gate or only-up rows, so
    the middle split crosses every shard boundary (GSPMD reshards; the
    shard_map TP path is outright wrong). Block ``d`` becomes
    ``[w1_d | w3_d]`` and the model's per-block split
    (``ModelArgs.ffn_device_blocks = n_blocks``) is shard-local."""
    I = args.intermediate_size
    assert I % n_blocks == 0, (I, n_blocks)
    ipd = I // n_blocks
    ff = params["layers"]["feed_forward"]
    if "w13" not in ff:
        return params  # legacy split layout shards cleanly already
    w = ff["w13"]
    parts = []
    for d in range(n_blocks):
        parts.append(_slice_out_features(w, d * ipd, ipd))
        parts.append(_slice_out_features(w, I + d * ipd, ipd))
    out = dict(params)
    out["layers"] = dict(params["layers"])
    out["layers"]["feed_forward"] = dict(ff)
    out["layers"]["feed_forward"]["w13"] = _concat_out_features(parts)
    return out


def prepare_tp_params(params: Any, args, n_blocks: int) -> Any:
    """Apply both device-major interleaves (wqkv + w13) for ``n_blocks``-
    way TP. The model must be built with
    ``qkv_device_blocks = ffn_device_blocks = n_blocks``."""
    params = interleave_qkv_params(params, args, n_blocks)
    return interleave_w13_params(params, args, n_blocks)
