"""PARQ prox maps + the quantizing optimizer wrapper.

Counterparts of the reference's ``prototype/parq/optim/``:

- ``prox_parq``: the PARQ soft projection (already in ``api.py`` as
  ``parq_prox_step``; re-exported here) — interpolate toward the grid
  with annealed λ;
- ``prox_binary_relax``: BinaryRelax (``binarelax.py``) — linear
  annealing ``p ← (1−θ)p + θ·q`` between ``anneal_start`` and
  ``anneal_end`` steps, hard projection afterwards;
- ``quant_optimizer``: the ``QuantOptimizer`` (``quantopt.py``) as an
  optax gradient transformation: wraps any base optimizer and applies
  the prox map to the selected weights after each update, with the
  step count carried in the optimizer state (pure/jit-friendly instead
  of the reference's in-place ``param_groups`` mutation).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from torchao_tpu.prototype.parq.api import parq_prox_step  # noqa: F401
from torchao_tpu.prototype.parq.quantizers import unif_quantize


def prox_binary_relax(
    w: jnp.ndarray,
    dq: jnp.ndarray,
    step: jnp.ndarray,
    anneal_start: int,
    anneal_end: int,
) -> jnp.ndarray:
    """BinaryRelax prox: nothing before ``anneal_start``, linear blend
    to the grid until ``anneal_end``, hard projection after."""
    theta = jnp.clip(
        (step - anneal_start) / max(anneal_end - anneal_start, 1),
        0.0, 1.0,
    ).astype(jnp.float32)
    out = (1.0 - theta) * w.astype(jnp.float32) + theta * dq.astype(
        jnp.float32
    )
    return out.astype(w.dtype)


class QuantOptimizerState(NamedTuple):
    inner: optax.OptState
    step: jnp.ndarray


def quant_optimizer(
    base: optax.GradientTransformation,
    quantize_fn: Callable = unif_quantize,
    prox: str = "parq",
    total_steps: int = 1000,
    lambda_start: float = 0.01,
    lambda_end: float = 100.0,
    anneal_start: int = 0,
    anneal_end: Optional[int] = None,
    filter_fn: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Wrap ``base`` so every update is followed by the prox map pulling
    selected weights onto ``quantize_fn``'s grid. ``filter_fn(leaf)``
    selects which leaves are quantized (default: ndim ≥ 2). The
    returned transformation must be used with ``base.update``'s
    ``params`` argument supplied (like ``optax.adamw``)."""
    if anneal_end is None:
        anneal_end = total_steps
    if filter_fn is None:
        filter_fn = lambda l: getattr(l, "ndim", 0) >= 2  # noqa: E731

    def init(params):
        return QuantOptimizerState(
            inner=base.init(params), step=jnp.zeros((), jnp.int32)
        )

    def update(grads, state, params=None):
        assert params is not None, "quant_optimizer needs params"
        upd, inner = base.update(grads, state.inner, params)
        new_params = optax.apply_updates(params, upd)
        step = state.step + 1

        t = jnp.clip(step / max(total_steps - 1, 1), 0.0, 1.0)
        lam = jnp.exp(
            (1.0 - t) * jnp.log(lambda_start) + t * jnp.log(lambda_end)
        )

        def fix(w):
            if not filter_fn(w):
                return w
            dq = quantize_fn(w)
            if prox == "binary_relax":
                return prox_binary_relax(
                    w, dq, step, anneal_start, anneal_end
                )
            wf = w.astype(jnp.float32)
            return (
                (wf + lam * dq.astype(jnp.float32)) / (1.0 + lam)
            ).astype(w.dtype)

        proxed = jax.tree_util.tree_map(fix, new_params)
        # return the DELTA that moves params to the proxed values, so
        # callers keep the standard optax update/apply_updates pattern
        delta = jax.tree_util.tree_map(
            lambda p_new, p_old: (
                p_new.astype(jnp.float32) - p_old.astype(jnp.float32)
            ).astype(p_old.dtype)
            if hasattr(p_old, "dtype") else p_new,
            proxed, params,
        )
        return delta, QuantOptimizerState(inner=inner, step=step)

    return optax.GradientTransformation(init, update)
