"""Optimizer-state host offload (TPU-native counterpart of the
reference's ``CPUOffloadOptimizer``, ``torchao/optim/cpu_offload.py``).

The reference moves optimizer state (and optionally gradients) to CPU
memory and steps the optimizer there, trading PCIe traffic for GPU
memory. The JAX-native expression of the same idea is *memory spaces*:
every TPU device exposes device (HBM) and host (pinned DRAM) memories,
``jax.device_put(x, jax.memory.Space.Host)`` pins an array to host —
inside or outside jit — and an array's placement is carried in its aval
(``x.aval.memory_space``). ``offload_optimizer`` wraps ANY optax-style
``GradientTransformation`` so its state lives in host memory — freeing
HBM by the full size of the optimizer state — while the update math
stays a normal jittable computation (the wrapper inserts the
host→device fetch; the returned state is re-pinned to host).

Differences from the reference, by design:
- No streams/hooks: placement is declarative (memory spaces), not
  imperative stream-ordered copies; under jit XLA schedules the
  transfers with its latency-hiding scheduler.
- ``minimal_size`` mirrors the reference knob (``cpu_offload.py:26``):
  small leaves stay in HBM, avoiding many tiny transfers.
- Composes with the quantized optimizers in ``optim/adam.py`` (an
  8-bit moment in host memory costs HBM nothing and DRAM 1 byte/elem).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_MINIMAL_SIZE = 4096


def host_memory_available() -> bool:
    """True when the backend exposes a host memory space."""
    try:
        kinds = [
            m.kind for m in jax.devices()[0].addressable_memories()
        ]
        return any("host" in k for k in kinds)
    except Exception:  # pragma: no cover
        return False


def _memory_space(x):
    aval = getattr(x, "aval", None)
    return getattr(aval, "memory_space", None)


def is_on_host(x) -> bool:
    return _memory_space(x) == jax.memory.Space.Host


def offload_to_host(tree, minimal_size: int = DEFAULT_MINIMAL_SIZE):
    """device_put every array leaf with >= ``minimal_size`` elements
    into the host memory space (works eagerly and under jit)."""

    def put(x):
        if not hasattr(x, "size") or x.size < minimal_size:
            return x
        if is_on_host(x):
            return x
        return jax.device_put(x, jax.memory.Space.Host)

    return jax.tree_util.tree_map(put, tree)


def fetch_from_host(tree):
    """device_put host-resident leaves back into device memory (HBM)."""

    def put(x):
        if is_on_host(x):
            return jax.device_put(x, jax.memory.Space.Device)
        return x

    return jax.tree_util.tree_map(put, tree)


class OffloadState(NamedTuple):
    inner: Any


def offload_optimizer(
    base,
    minimal_size: int = DEFAULT_MINIMAL_SIZE,
):
    """Wrap an optax ``GradientTransformation`` so its state lives in
    host memory (reference ``CPUOffloadOptimizer(params, optim_cls)``).

    ``init`` places every state leaf >= ``minimal_size`` elements in
    the host memory space; ``update`` fetches them to device, runs the
    base update, and pins the new state back to host. Both compose with
    ``jax.jit`` — placement ops trace into the program and XLA overlaps
    the transfers with surrounding compute.
    """
    import optax

    def init(params):
        st = base.init(params)
        if host_memory_available():
            st = offload_to_host(st, minimal_size)
        return OffloadState(inner=st)

    def update(grads, state, params=None):
        inner = fetch_from_host(state.inner)
        updates, new_inner = base.update(grads, inner, params)
        if host_memory_available():
            new_inner = offload_to_host(new_inner, minimal_size)
        return updates, OffloadState(inner=new_inner)

    return optax.GradientTransformation(init, update)


def repin_state(state, minimal_size: int = DEFAULT_MINIMAL_SIZE):
    """Re-place an offload state's large leaves into host memory (only
    needed after manual state surgery; ``update`` already re-pins)."""
    if not host_memory_available():
        return state
    if isinstance(state, OffloadState):
        return OffloadState(inner=offload_to_host(state.inner, minimal_size))
    return offload_to_host(state, minimal_size)
