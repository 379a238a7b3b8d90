"""Pipeline parallelism over the layer axis (beyond the reference).

The reference has NO pipeline parallelism (SURVEY.md §2.10: "PP —
absent"). TPU-natively it falls out of this framework's stacked-layer
design: every layer weight (and every quantized-leaf: qdata, group
scales, eff qparams) and every KV-cache leaf carries a leading ``L``
axis, so a pipeline stage's shard is just ``PartitionSpec("pipe", ...)``
on dim 0 — no per-layer module surgery.

Execution model (``shard_map`` over the ``pipe`` mesh axis):

- stage ``p`` owns layers ``[p·L/P, (p+1)·L/P)`` plus a replicated copy
  of the embedding / final-norm / output-head weights (tiny next to the
  layer stack).
- one forward = ``P`` ticks, unrolled: at tick ``t`` only stage
  ``p == t`` computes (a ``lax.cond`` keeps idle stages idle — the
  branch is local, collectives stay outside), then the activation is
  ``ppermute``-d to stage ``p+1``. Stage 0 embeds; the last stage
  applies final norm + head; the logits are ``psum``-masked out.
- KV caches shard on the SAME layer axis, so each stage updates only
  its local [L/P, ...] cache — no cache communication ever.

This is the latency-oriented (memory-scaling) pipeline: wall-clock per
step ≈ an unsharded step (each tick runs L/P layers) + (P−1) activation
hops, while per-device weight/cache memory drops by P — the
configuration that fits Llama-3.1-405B on a pod slice. Microbatch
overlap (GPipe-style bubble filling for throughput) composes on top by
batching independent requests through the same program and is noted as
future work; serving throughput on one replica is covered by TP
(`sharding.py`) + the continuous-batching engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    transformer_forward,
)


def pp_param_specs(params: Any, mesh: Mesh, pipe_axis: str = "pipe"):
    """Layer stacks shard on dim 0 (the layer axis); embeddings, final
    norm, and the output head replicate."""
    from torchao_tpu.parallel.sharding import param_shardings

    base = {
        "layers.": P(pipe_axis),
        "tok_embeddings.": P(),
        "norm.": P(),
        "output.": P(),
    }
    return param_shardings(params, base, mesh)


def pp_cache_specs(cache: Any, mesh: Mesh, pipe_axis: str = "pipe"):
    """Every cache leaf is [L, ...] — shard the layer axis."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, P(*((pipe_axis,) + (None,) * (leaf.ndim - 1)))
        ),
        cache,
    )


def make_pp_forward(
    model: Transformer,
    mesh: Mesh,
    pipe_axis: str = "pipe",
):
    """Build ``fn(params, tokens, input_pos, cache) -> (logits, cache)``
    running the model as a layer pipeline over ``mesh[pipe_axis]``.
    ``params``/``cache`` must be placed with :func:`pp_param_specs` /
    :func:`pp_cache_specs`. Works for prefill (T>1) and decode (T=1)."""
    n_stages = mesh.shape[pipe_axis]
    args = model.args
    assert args.n_layer % n_stages == 0, (args.n_layer, n_stages)
    l_per = args.n_layer // n_stages
    largs = dataclasses.replace(args)
    largs.n_layer = l_per
    freqs = model.freqs
    dtype = model.dtype

    def local_params_spec_tree(tree):
        return jax.tree_util.tree_map(lambda *_: 0, tree)

    def inner(params, tokens, input_pos, cache):
        p = jax.lax.axis_index(pipe_axis)
        B, T = tokens.shape
        D = args.dim
        x = jnp.zeros((B, T, D), dtype)

        for t in range(n_stages):  # unrolled: t is static
            def active(operand):
                x, cache = operand
                if t == 0:
                    from torchao_tpu import ops

                    x = ops.embedding(
                        params["tok_embeddings"]["weight"], tokens
                    )
                h, new_cache = transformer_forward(
                    params, tokens, input_pos, cache, freqs, largs,
                    inputs_embeds=x, head=False,
                )
                return h.astype(dtype), new_cache

            x, cache = jax.lax.cond(
                p == t, active, lambda o: o, (x, cache)
            )
            if t < n_stages - 1:
                x = jax.lax.ppermute(
                    x, pipe_axis,
                    [(i, i + 1) for i in range(n_stages - 1)],
                )

        # final norm + head on the last stage only; psum broadcasts
        from torchao_tpu import ops
        from torchao_tpu.models.llama.model import rms_norm

        def head(x):
            h = rms_norm(x, params["norm"]["weight"], args.norm_eps)
            w = (
                params["tok_embeddings"]["weight"]
                if args.tie_word_embeddings
                else params["output"]["weight"]
            )
            return ops.linear(h, w).astype(jnp.float32)

        logits = jax.lax.cond(
            p == n_stages - 1,
            head,
            lambda x: jnp.zeros((B, T, args.vocab_size), jnp.float32),
            x,
        )
        logits = jax.lax.psum(logits, pipe_axis)
        return logits, cache

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def _spec_tree(params):
        def spec_of(key_path, leaf):
            top = None
            for k in key_path:
                if hasattr(k, "key"):
                    top = str(k.key)
                    break
            if top == "layers":
                return P(*((pipe_axis,) + (None,) * (leaf.ndim - 1)))
            return P(*((None,) * leaf.ndim))
        return jax.tree_util.tree_map_with_path(spec_of, params)

    def _cache_spec_tree(cache):
        return jax.tree_util.tree_map(
            lambda leaf: P(
                *((pipe_axis,) + (None,) * (leaf.ndim - 1))
            ),
            cache,
        )

    import inspect

    _sm_params = inspect.signature(shard_map).parameters
    _check_kw = (
        {"check_vma": False} if "check_vma" in _sm_params
        else {"check_rep": False}
    )

    @jax.jit
    def fn(params, tokens, input_pos, cache):
        sm = shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                _spec_tree(params), P(), P(), _cache_spec_tree(cache)
            ),
            out_specs=(P(), _cache_spec_tree(cache)),
            **_check_kw,
        )
        return sm(params, tokens, jnp.asarray(input_pos, jnp.int32), cache)

    return fn


def make_pp_microbatch_forward(
    model: Transformer,
    mesh: Mesh,
    num_microbatches: int,
    pipe_axis: str = "pipe",
):
    """GPipe-style microbatched pipeline forward (throughput
    configuration — ROADMAP round-3 parallelism item).

    The plain :func:`make_pp_forward` runs one activation wave through
    ``P`` stages: at any tick only one stage computes (wall ≈ unsharded
    + hops; the win is P× memory). This schedule splits the batch into
    ``M = num_microbatches`` microbatches and runs the classic
    ``P + M − 1``-tick pipeline: at tick ``t`` stage ``p`` processes
    microbatch ``m = t − p`` — after the ``P−1``-tick fill, ALL stages
    compute concurrently on different microbatches, so throughput
    approaches ``P·M/(P+M−1)`` × the one-stage-at-a-time schedule.

    SPMD realization (no per-stage programs): every device runs the
    same unrolled tick loop; its microbatch index ``m = t − axis_index``
    is traced, so microbatch data (tokens, per-slot positions, cache
    batch rows) is dynamic-sliced by ``m`` and results are written back
    gated on tick validity (``0 ≤ m < M``). Activations hop stages via
    ``ppermute`` each tick exactly as in the plain pipeline.

    Requires ``B % num_microbatches == 0``. Returns
    ``fn(params, tokens, input_pos, cache) -> (logits, cache)`` with the
    same placement contract as :func:`make_pp_forward`.
    """
    n_stages = mesh.shape[pipe_axis]
    M = num_microbatches
    args = model.args
    assert args.n_layer % n_stages == 0, (args.n_layer, n_stages)
    largs = dataclasses.replace(args)
    largs.n_layer = args.n_layer // n_stages
    freqs = model.freqs
    dtype = model.dtype

    def inner(params, tokens, input_pos, cache):
        from torchao_tpu import ops
        from torchao_tpu.models.llama.model import rms_norm

        p = jax.lax.axis_index(pipe_axis)
        B, T = tokens.shape
        assert B % M == 0, (B, M)
        Bm = B // M
        D = args.dim
        pos_vec = getattr(input_pos, "ndim", 0) == 1

        def slice_mb(arr, m, axis):
            start = [0] * arr.ndim
            sizes = list(arr.shape)
            start[axis] = m * Bm
            sizes[axis] = Bm
            return jax.lax.dynamic_slice(arr, start, sizes)

        def update_mb(arr, upd, m, axis):
            start = [0] * arr.ndim
            start[axis] = m * Bm
            return jax.lax.dynamic_update_slice(arr, upd, start)

        x = jnp.zeros((Bm, T, D), dtype)
        logits = jnp.zeros((B, T, args.vocab_size), jnp.float32)

        for t in range(n_stages + M - 1):  # unrolled: t is static
            m_raw = t - p
            valid = jnp.logical_and(m_raw >= 0, m_raw < M)
            m = jnp.clip(m_raw, 0, M - 1)
            toks_m = slice_mb(tokens, m, 0)
            pos_m = slice_mb(input_pos, m, 0) if pos_vec else input_pos
            cache_m = jax.tree_util.tree_map(
                lambda leaf: slice_mb(leaf, m, 1), cache
            )

            def active(operand):
                x, cache_m = operand
                if True:  # stage 0 embeds its own microbatch
                    x = jnp.where(
                        p == 0,
                        ops.embedding(
                            params["tok_embeddings"]["weight"], toks_m
                        ).astype(dtype),
                        x,
                    )
                h, new_cache_m = transformer_forward(
                    params, toks_m, pos_m, cache_m, freqs, largs,
                    inputs_embeds=x, head=False,
                )
                return h.astype(dtype), new_cache_m

            x_out, cache_m_out = jax.lax.cond(
                valid, active, lambda o: o, (x, cache_m)
            )
            cache = jax.tree_util.tree_map(
                lambda full, mb: jnp.where(
                    valid, update_mb(full, mb, m, 1), full
                ),
                cache, cache_m_out,
            )

            # last stage: final norm + head, accumulate this mb's logits
            def head(xm):
                h = rms_norm(xm, params["norm"]["weight"], args.norm_eps)
                w = (
                    params["tok_embeddings"]["weight"]
                    if args.tie_word_embeddings
                    else params["output"]["weight"]
                )
                return ops.linear(h, w).astype(jnp.float32)

            is_last = jnp.logical_and(valid, p == n_stages - 1)
            lg = jax.lax.cond(
                is_last,
                head,
                lambda xm: jnp.zeros((Bm, T, args.vocab_size),
                                     jnp.float32),
                x_out,
            )
            logits = jnp.where(
                is_last, update_mb(logits, lg, m, 0), logits
            )

            if t < n_stages + M - 2:
                x = jax.lax.ppermute(
                    x_out, pipe_axis,
                    [(i, i + 1) for i in range(n_stages - 1)],
                )

        logits = jax.lax.psum(logits, pipe_axis)
        return logits, cache

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def _spec_tree(params):
        def spec_of(key_path, leaf):
            top = None
            for k in key_path:
                if hasattr(k, "key"):
                    top = str(k.key)
                    break
            if top == "layers":
                return P(*((pipe_axis,) + (None,) * (leaf.ndim - 1)))
            return P(*((None,) * leaf.ndim))
        return jax.tree_util.tree_map_with_path(spec_of, params)

    def _cache_spec_tree(cache):
        return jax.tree_util.tree_map(
            lambda leaf: P(*((pipe_axis,) + (None,) * (leaf.ndim - 1))),
            cache,
        )

    import inspect

    _sm_params = inspect.signature(shard_map).parameters
    _check_kw = (
        {"check_vma": False} if "check_vma" in _sm_params
        else {"check_rep": False}
    )

    @jax.jit
    def fn(params, tokens, input_pos, cache):
        sm = shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                _spec_tree(params), P(), P(), _cache_spec_tree(cache)
            ),
            out_specs=(P(), _cache_spec_tree(cache)),
            **_check_kw,
        )
        return sm(params, tokens, jnp.asarray(input_pos, jnp.int32), cache)

    return fn
