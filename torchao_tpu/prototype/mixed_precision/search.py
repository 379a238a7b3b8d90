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
