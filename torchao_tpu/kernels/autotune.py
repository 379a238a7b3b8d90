"""Kernel block-size autotuner with a persisted JSON config cache.

Parity with the reference's Triton autotuner (``torchao/kernel/
autotuner.py:106-140`` + cached configs under ``kernel/configs/``):
candidate block configurations are timed on the live device (value-fetch
synced — see PERF.md), the argmin is memoized in a JSON file keyed by
(kernel, shape signature, device), and later calls reuse it with zero
timing cost.

Enabled with ``TORCHAO_TPU_AUTOTUNE=1`` (compiles are minutes over this
environment's remote-compile tunnel, so autotuning is opt-in like the
reference's ``TORCHAO_AUTOTUNER_ENABLE``); otherwise the kernels' static
heuristics apply, and a pre-populated cache is honored either way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "configs",
    "autotune_cache.json",
)

_cache: Optional[Dict[str, Any]] = None


def _cache_path() -> str:
    return os.environ.get("TORCHAO_TPU_AUTOTUNE_CACHE", DEFAULT_CACHE)


def _load_cache() -> Dict[str, Any]:
    global _cache
    if _cache is None:
        try:
            with open(_cache_path()) as f:
                _cache = json.load(f)
        except (OSError, ValueError):
            _cache = {}
    return _cache


def _save_cache():
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(_cache, f, indent=1, sort_keys=True)


def autotune_enabled() -> bool:
    return os.environ.get("TORCHAO_TPU_AUTOTUNE") == "1"


def _key(kernel_name: str, shape_sig: Sequence) -> str:
    dev = jax.default_backend()
    return f"{kernel_name}|{dev}|{','.join(map(str, shape_sig))}"


def time_amortized(
    run: Callable[[jnp.ndarray], Any], x: jnp.ndarray, iters: int = 20
) -> float:
    """Time ``run(x)`` with the methodology this platform requires
    (PERF.md / bench.py): ``iters`` calls chained by a data dependency
    inside ONE jitted ``lax.fori_loop`` (so per-dispatch tunnel RTT
    ~1.2 ms amortizes away and XLA cannot hoist the loop-invariant
    call), synced by a VALUE FETCH (``block_until_ready`` returns early
    on the remote backend). Returns seconds per call."""

    @jax.jit
    def loop(x0):
        def body(i, acc):
            xi = (
                x0 * (jnp.float32(1.0) + acc * 1e-30).astype(x0.dtype)
                if jnp.issubdtype(x0.dtype, jnp.floating)
                else x0
            )
            out = run(xi)
            return acc + jnp.ravel(out)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(x))  # compile + first-run sync
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / iters


def lookup_or_tune(
    kernel_name: str,
    shape_sig: Sequence,
    candidates: List[Dict[str, Any]],
    run: Callable[..., Any],
    iters: int = 20,
    example_x: Optional[jnp.ndarray] = None,
) -> Optional[Dict[str, Any]]:
    """Returns the cached/tuned best candidate kwargs, or None when no
    cache entry exists and tuning is disabled (caller uses heuristics).

    ``run(cfg, x)`` must be traceable so candidates can be timed with
    :func:`time_amortized` (in-jit loop); ``example_x`` is the
    activation operand the harness perturbs for the loop-carried data
    dependency."""
    cache = _load_cache()
    key = _key(kernel_name, shape_sig)
    if key in cache:
        return cache[key]["config"]
    if not autotune_enabled() or example_x is None:
        return None

    best_cfg, best_t = None, None
    results = {}
    for cfg in candidates:
        try:
            t = time_amortized(
                lambda xi, cfg=cfg: run(cfg, xi), example_x, iters
            )
        except Exception:
            continue
        results[json.dumps(cfg, sort_keys=True)] = round(t * 1e6, 2)
        if best_t is None or t < best_t:
            best_cfg, best_t = cfg, t
    if best_cfg is not None:
        cache[key] = {
            "config": best_cfg,
            "time_us": round(best_t * 1e6, 2),
            "all_us": results,
        }
        _save_cache()
    return best_cfg


def int4_matmul_candidates(M: int, N: int, K: int, g: int):
    """Candidate (bn, bkp) blocks for the int4 dequant-matmul. An
    on-device sweep at the Llama-3-8B decode shape (PERF.md) ranked
    bn=bkp=1024 and bn=4096/bkp=512 ~12% over the old 512/512 default;
    the grid spans that neighborhood."""
    out = []
    for bn in (256, 512, 1024, 2048, 4096):
        for bkp in (256, 512, 1024):
            if bkp % (8 * g) == 0:  # Mosaic scale-block rule (see kernel)
                out.append({"bn": min(bn, N), "bkp": bkp})
    # the scale-on-partials variant with its preferred tight unroll
    for bn in (1024, 2048, 4096):
        out.append({
            "bn": min(bn, N), "bkp": 8 * g, "variant": "group_partial",
        })
    # batched-int8 variant (decode-shaped M only; see _kernel_bint8)
    if M <= 16:
        for bn in (512, 1024, 2048):
            for bkp in (512, 1024):
                if bkp % (8 * g) == 0:
                    out.append({
                        "bn": min(bn, N), "bkp": bkp,
                        "variant": "batched_int8",
                    })
        # stacked banded fat-dot variant (few fat MXU issues per grid
        # step vs ~2·bg batched sub-dots; measured 125.6 vs 127.4 tok/s
        # on the 8B headline — close enough that other shapes may flip)
        for bn in (1024, 2048):
            out.append({
                "bn": min(bn, N), "bkp": 1024, "variant": "banded",
            })
    return out


def int8_matmul_candidates(M: int, N: int, K: int):
    """Candidate blocks for the int8×int8 scaled matmul (per-step
    overhead favors big blocks on this platform)."""
    out = []
    for bn in (512, 1024, 2048):
        for bk in (512, 1024, 2048):
            out.append({"bn": min(bn, N), "bk": min(bk, K)})
    return out
