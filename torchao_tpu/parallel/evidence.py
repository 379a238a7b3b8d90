"""Quantitative multi-chip evidence: weak-scaling timing + HLO collective
inspection for the TP decode path.

The reference has no multi-device CI at all (SURVEY.md §4: single-node
multi-process DTensor tests only); the north star here is ≥85% TP scaling
efficiency. Real multi-chip hardware is not reachable from this
environment, so this module produces the two proxies the design CAN
prove on an N-virtual-device CPU mesh (and the same code runs unchanged
on a real TPU pod slice):

1. **Weak-scaling timing** — decode per-step wall time for a base model
   on ONE device vs a model with ``m``× the sharded dimensions (heads,
   FFN width) TP-sharded over ``m`` devices. Per-device work is constant,
   so ideal scaling is a ratio of 1.0; the measured ratio bounds the
   collective + imbalance overhead of the sharding rules.
2. **HLO inspection** — compile the TP decode step and assert the
   collective *structure* is the canonical Megatron pattern the XLA
   latency-hiding scheduler can overlap: column-parallel then
   row-parallel linears must produce at most ONE reduction collective
   per attention block and per FFN block (+ head gather), and no
   accidental resharding (all-to-all / host transfers). On backends with
   async collectives (TPU) the ``-start``/``-done`` split is counted as
   direct overlap evidence; the CPU backend lowers collectives
   synchronously, so there the structural bound is the evidence.
"""

from __future__ import annotations

import re
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.parallel.sharding import (
    kv_cache_specs,
    make_mesh,
    shard_params,
)


def _build(dim, n_head, intermediate, n_layer=2, vocab=512,
           qkv_device_blocks=1):
    from torchao_tpu.models.llama.model import ModelArgs, Transformer

    args = ModelArgs(
        block_size=64, vocab_size=vocab, n_layer=n_layer, n_head=n_head,
        n_local_heads=n_head, dim=dim, intermediate_size=intermediate,
        rope_base=10000, qkv_device_blocks=qkv_device_blocks,
    )
    return Transformer(args, dtype=jnp.float32)


def _time_decode(model, params, cache, steps=16, reps=3) -> float:
    """Per-step seconds for a jitted ``steps``-step decode scan (value-
    fetch synced — PERF.md timing methodology)."""

    @jax.jit
    def decode_n(p, tok, cache):
        def body(carry, _):
            tok, cache, pos = carry
            logits, cache = model(p, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return (nxt, cache, pos + 1), ()

        (tok, cache, _), _ = jax.lax.scan(
            body, (tok, cache, jnp.int32(1)), None, length=steps
        )
        return tok, cache

    B = cache[0]["k"].shape[0] if isinstance(cache, list) else 2
    tok = jnp.zeros((B, 1), jnp.int32)
    out, _ = decode_n(params, tok, cache)
    int(out[0, 0])  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = decode_n(params, tok, cache)
        int(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / steps


def collective_stats(hlo_text: str) -> Dict[str, int]:
    """Count collective ops in optimized HLO text."""
    stats = {}
    for name in (
        "all-reduce", "all-gather", "reduce-scatter",
        "collective-permute", "all-to-all",
    ):
        # async forms count once under their -start op
        starts = len(re.findall(rf"{name}-start", hlo_text))
        sync = len(
            re.findall(rf"(?<!-){name}(?!-start|-done)\(", hlo_text)
        ) + len(re.findall(rf"= {name} ", hlo_text))
        stats[name] = starts + sync
        stats[name + "_async"] = starts
    return stats


def tp_decode_evidence(
    n_devices: int, steps: int = 16, dim: int = 256,
) -> Dict[str, Any]:
    """Weak-scaling timing + HLO collective structure for the int4 TP
    decode path (VERDICT r2 #7). Returns a JSON-able dict."""
    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    m = n_devices
    B = 2
    heads = max(4, dim // 64)
    inter = 2 * dim

    # --- same scaled model, UNSHARDED on one device --------------------
    # (the clean efficiency denominator on a shared-core CPU mesh: both
    # runs do identical total compute on the same silicon, so the ratio
    # isolates collective + partitioning overhead)
    big1 = _build(dim=dim, n_head=heads * m, intermediate=inter * m)
    q1 = quantize_(
        big1.init_params(jax.random.PRNGKey(1)),
        Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    t_big1 = _time_decode(big1, q1, big1.setup_caches(B, 64), steps=steps)

    # --- scaled: m× sharded dims over an m-device model mesh -----------
    from torchao_tpu.parallel.sharding import interleave_qkv_params

    mesh = make_mesh({"data": 1, "model": m})
    big = _build(
        dim=dim, n_head=heads * m, intermediate=inter * m,
        qkv_device_blocks=m,
    )
    qparams = quantize_(
        big.init_params(jax.random.PRNGKey(1)),
        Int4WeightOnlyConfig(group_size=32),
        filter_fn=default_linear_filter,
    )
    qparams = interleave_qkv_params(qparams, big.args, m)
    with mesh:
        sparams = shard_params(qparams, mesh)
        scache = jax.device_put(
            big.setup_caches(B, 64), kv_cache_specs(big.setup_caches(B, 64), mesh)
        )
        t_tp = _time_decode(big, sparams, scache, steps=steps)

        # --- HLO inspection of ONE decode step -------------------------
        @jax.jit
        def decode_step(p, tok, cache):
            logits, cache = big(p, tok, 1, cache)
            return jnp.argmax(logits[:, -1], -1), cache

        tok = jnp.zeros((B, 1), jnp.int32)
        hlo = decode_step.lower(sparams, tok, scache).compile().as_text()

    stats = collective_stats(hlo)
    L = big.args.n_layer
    reductions = stats["all-reduce"] + stats["reduce-scatter"]
    # canonical Megatron TP (scan body counts once in HLO): one psum per
    # row-parallel linear (wo, w2) + up to 3 for head/sampling glue
    assert reductions >= 1, f"TP decode compiled with no reductions:\n{stats}"
    assert reductions <= 2 + 3, (
        f"more reductions than the canonical TP pattern: {stats}"
    )
    # weight-sized resharding is the failure mode this guards against:
    # the naive fused-qkv split / packed-half concat compiled to u8
    # weight all-to-alls EVERY step (fixed by interleave_qkv_params +
    # the half-contracted XLA int4 path). Remaining permutes move only
    # KB-scale qparam slices.
    assert stats["all-to-all"] == 0, stats
    async_pairs = sum(v for k, v in stats.items() if k.endswith("_async"))
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        assert async_pairs > 0, (
            "TPU backend compiled TP decode without async collectives"
        )

    eff = t_big1 / t_tp if t_tp > 0 else 0.0
    return {
        "devices": m,
        "dim_per_device": dim,
        "tp_timing": {
            "scaled_unsharded_step_ms": round(t_big1 * 1e3, 3),
            "scaled_tp_step_ms": round(t_tp * 1e3, 3),
            "tp_efficiency": round(eff, 3),
            "note": (
                "scaled model = heads & FFN width ×devices; efficiency ="
                " unsharded/TP wall on identical total compute (shared-"
                "core CPU mesh: isolates partitioning+collective cost; "
                "decode TP is latency-bound at toy widths — report the "
                "trend over dim_per_device; the same harness reports "
                "true scaling on a real slice)"
            ),
        },
        "hlo": {
            "backend": backend,
            "reduction_collectives": reductions,
            "async_collective_starts": async_pairs,
            "reduction_bound": 5,
            "stats": {k: v for k, v in stats.items() if v},
        },
    }
