"""Sensitivity-based mixed-precision search.

Covers the reference's ``prototype/quantization/mixed_precision`` (and the
graph-aware part of autoquant_v2): measure each layer's quality impact
under each candidate config, then greedily assign the cheapest config per
layer subject to a total quality budget — emitting a ``ModuleFqnToConfig``
that ``quantize_`` applies directly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.quantization.quant_api import (
    ModuleFqnToConfig,
    _default_filter,
    _path_str,
)
from torchao_tpu.quantization.transform_module import get_quantize_handler


def _leaf_paths(params, filter_fn) -> List[str]:
    paths = []

    def visit(kp, leaf):
        p = _path_str(kp)
        if filter_fn(p, leaf):
            paths.append(p)
        return leaf

    jax.tree_util.tree_map_with_path(
        visit, params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )
    return paths


def _quantize_one(params, target_path: str, config: AOBaseConfig):
    def transform(kp, leaf):
        if _path_str(kp) != target_path:
            return leaf
        return get_quantize_handler(config)(leaf, config)

    return jax.tree_util.tree_map_with_path(
        transform, params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )


def _bytes_of_leaf(params, path: str) -> int:
    node = params
    for k in path.split("."):
        node = node[k]
    leaves = jax.tree_util.tree_leaves(node)
    return sum(l.size * l.dtype.itemsize for l in leaves)


def sensitivity_analysis(
    params,
    eval_fn: Callable[[Any], float],   # higher = better (e.g. logits SQNR)
    candidate_configs: Sequence[AOBaseConfig],
    filter_fn=None,
) -> Dict[str, Dict[str, float]]:
    """Quality of the model with ONLY `path` quantized, per candidate."""
    if filter_fn is None:
        filter_fn = _default_filter
    out: Dict[str, Dict[str, float]] = {}
    for path in _leaf_paths(params, filter_fn):
        out[path] = {}
        for cfg in candidate_configs:
            q = _quantize_one(params, path, cfg)
            out[path][type(cfg).__name__] = float(eval_fn(q))
    return out


def mixed_precision_search(
    params,
    eval_fn: Callable[[Any], float],
    candidate_configs: Sequence[AOBaseConfig],  # ordered cheapest-first
    min_quality: float,
    filter_fn=None,
) -> Tuple[ModuleFqnToConfig, Dict[str, str]]:
    """Greedy: per layer pick the CHEAPEST config whose single-layer
    quality stays above ``min_quality``; layers failing every candidate
    stay high-precision. Returns (ModuleFqnToConfig, decisions)."""
    if filter_fn is None:
        filter_fn = _default_filter
    sens = sensitivity_analysis(
        params, eval_fn, candidate_configs, filter_fn
    )
    mapping: Dict[str, Optional[AOBaseConfig]] = {}
    decisions: Dict[str, str] = {}
    for path, results in sens.items():
        chosen = None
        for cfg in candidate_configs:  # cheapest first
            if results[type(cfg).__name__] >= min_quality:
                chosen = cfg
                break
        mapping[path] = chosen
        decisions[path] = (
            type(chosen).__name__ if chosen is not None else "hp"
        )
    return ModuleFqnToConfig(mapping), decisions


# ---------------------------------------------------------------------------
# autoquant_v2 essence: batch-shape interpolation + Pareto frontier search
# (reference ``prototype/quantization/autoquant_v2.py``: graph-partition
# sensitivity + per-batch-shape kernel timing interpolation)
# ---------------------------------------------------------------------------


def interpolate_batch_cost(
    measured: Dict[int, float], M: int
) -> float:
    """Piecewise-linear interpolation of a per-config kernel cost over
    batch shape (the reference's autoquant interpolates measured batch
    sizes to unseen ones, ``autoquant.py:327`` + autoquant_v2): measured
    maps M -> seconds; unseen M interpolates between bracketing points
    and extrapolates linearly-per-row outside the measured range."""
    pts = sorted(measured.items())
    assert pts, "no measured points"
    if M <= pts[0][0]:
        return pts[0][1] * (M / pts[0][0]) if M < pts[0][0] else pts[0][1]
    for (m0, t0), (m1, t1) in zip(pts, pts[1:]):
        if m0 <= M <= m1:
            f = (M - m0) / (m1 - m0)
            return t0 + f * (t1 - t0)
    m1, t1 = pts[-1]
    return t1 * M / m1  # beyond the largest: cost ~ rows


def quantized_bytes(params, path: str, config: Optional[AOBaseConfig]) -> int:
    """Decode-streamed bytes of ``path`` under ``config`` (None = keep
    high precision). Bytes/token is the cost model for weight-bound
    decode (PERF.md: effective tok/s tracks streamed weight bytes)."""
    if config is None:
        return _bytes_of_leaf(params, path)
    node = params
    for k in path.split("."):
        node = node[k]
    q = get_quantize_handler(config)(node, config)
    leaves = jax.tree_util.tree_leaves(q)
    return sum(l.size * l.dtype.itemsize for l in leaves)


def pareto_mixed_precision(
    params,
    eval_fn: Callable[[Any], float],   # higher = better (e.g. -ppl, SQNR)
    candidate_configs: Sequence[AOBaseConfig],  # any order
    filter_fn=None,
    num_points: int = 4,
) -> List[Dict[str, Any]]:
    """Quality/bytes frontier search (the autoquant_v2 essence).

    Per layer, each candidate gets a (bytes, single-layer quality)
    point; starting from every layer at its highest-quality candidate,
    layers are greedily downgraded in order of least quality-loss per
    byte saved, and the FULL model is re-evaluated at ``num_points``
    byte budgets along the path. Returns frontier points
    ``{"mapping": ModuleFqnToConfig, "decisions", "bytes", "quality"}``
    sorted by bytes descending."""
    if filter_fn is None:
        filter_fn = _default_filter
    paths = _leaf_paths(params, filter_fn)
    sens = sensitivity_analysis(
        params, eval_fn, candidate_configs, filter_fn
    )
    by_bytes: Dict[str, List[Tuple[int, float, AOBaseConfig]]] = {}
    for path in paths:
        opts = []
        for cfg in candidate_configs:
            opts.append((
                quantized_bytes(params, path, cfg),
                sens[path][type(cfg).__name__],
                cfg,
            ))
        opts.sort(key=lambda o: -o[0])  # most bytes (≈ best) first
        by_bytes[path] = opts

    # start at the highest-quality (per-layer best-quality) candidate
    state = {p: max(by_bytes[p], key=lambda o: o[1]) for p in paths}

    def total_bytes():
        return sum(state[p][0] for p in paths)

    # downgrade steps: (density, path, option) — density = quality lost
    # per byte saved relative to the CURRENT state of that path
    def next_downgrade():
        best = None
        for p in paths:
            cur_b, cur_q, _ = state[p]
            for b, q, cfg in by_bytes[p]:
                if b >= cur_b:
                    continue
                dens = (cur_q - q) / max(cur_b - b, 1)
                if best is None or dens < best[0]:
                    best = (dens, p, (b, q, cfg))
        return best

    # record points at evenly spaced byte budgets between start and min
    min_bytes = sum(min(o[0] for o in by_bytes[p]) for p in paths)
    start_bytes = total_bytes()
    budgets = [
        start_bytes - (start_bytes - min_bytes) * i / max(num_points - 1, 1)
        for i in range(num_points)
    ]
    frontier = []
    bi = 0
    while bi < len(budgets):
        if total_bytes() <= budgets[bi]:
            mapping = {p: state[p][2] for p in paths}
            decisions = {p: type(state[p][2]).__name__ for p in paths}
            q = float(eval_fn(_apply_mapping(params, mapping)))
            frontier.append({
                "mapping": ModuleFqnToConfig(dict(mapping)),
                "decisions": decisions,
                "bytes": total_bytes(),
                "quality": q,
            })
            bi += 1
            continue
        step = next_downgrade()
        if step is None:
            break
        _, p, opt = step
        state[p] = opt
    return frontier


def _apply_mapping(params, mapping: Dict[str, AOBaseConfig]):
    def transform(kp, leaf):
        p = _path_str(kp)
        cfg = mapping.get(p)
        if cfg is None:
            return leaf
        return get_quantize_handler(cfg)(leaf, cfg)

    return jax.tree_util.tree_map_with_path(
        transform, params,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )
