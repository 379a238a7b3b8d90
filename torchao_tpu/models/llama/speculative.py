"""Speculative decoding (draft-verify rejection sampling), device-side.

A capability beyond the reference (torchao's ``generate.py`` has no
speculative path; gpt-fast upstream ships one on GPU). Standard
speculative sampling (Leviathan et al. / Chen et al.): a small draft
model proposes ``spec_k`` tokens autoregressively, the target model
scores all of them in ONE forward (k+1 positions — a tall skinny matmul
that costs barely more than a single decode step on the weight-bound MXU
path), and a token-level rejection test keeps the emitted distribution
EXACTLY the target model's:

- accept draft token ``d_i`` with prob ``min(1, p_tgt(d_i)/p_draft(d_i))``
- at the first rejection, resample from ``norm(max(p_tgt - p_draft, 0))``
- if all k accepted, sample one bonus token from the target's last position

Greedy (``temperature=0``) degenerates to: accept while the draft token
equals the target argmax — so greedy speculative output is bit-identical
to greedy vanilla decode under identical arithmetic (tested exactly on
CPU f32). CAVEAT measured on TPU bf16: the tall-skinny verify forward
(T = k+1) may tile/accumulate matmuls differently from the T = 1 decode
step, so bf16 logit near-ties can resolve differently and greedy streams
can diverge at tie positions — the same determinism property as any
chunked/batched prefill, not a property of the rejection rule (the
SAMPLED distribution is exactly the target's regardless).

TPU-native design: the whole loop is ONE jitted ``lax.while_loop`` —
draft scan, verify forward, acceptance math, and cache writes all stay
on device; no host round trip per round. Both KV caches rely on the
same overwrite-ahead invariant as the serving engine
(``serving/engine.py``): rejected positions' cache entries are garbage
only at positions >= the accepted cursor, and every later round's
writes land at exactly those positions before any query can attend to
them (queries at position p attend only to slots <= p).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.generate import logits_to_probs, make_prefill
from torchao_tpu.models.llama.model import Transformer
from torchao_tpu.qtypes.base import QuantizedArray


def _truncate_stacked(leaf, n: int):
    """First ``n`` layers of a stacked-layer leaf (plain or quantized)."""
    if isinstance(leaf, QuantizedArray):
        new = jax.tree_util.tree_map(lambda x: x[:n], leaf)
        ls = getattr(new, "logical_shape", None)
        if ls is not None and len(ls) >= 3:
            new = dataclasses.replace(
                new, logical_shape=(n,) + tuple(ls[1:])
            )
        return new
    return leaf[:n]


def early_exit_draft(
    model: Transformer, params: Dict[str, Any], n_layers: int
) -> Tuple[Transformer, Dict[str, Any]]:
    """Self-drafting draft model: the target's FIRST ``n_layers``
    decoder layers (sliced from the stacked weights), sharing the
    target's embeddings, final norm, and output head. With a trained
    checkpoint this gives speculative decoding with no separate draft
    checkpoint (early-exit drafting); the slice costs ``n/L`` of the
    quantized weight memory."""
    assert 1 <= n_layers < model.args.n_layer
    dargs = dataclasses.replace(model.args)
    dargs.n_layer = n_layers
    draft = Transformer(dargs, dtype=model.dtype)
    dparams = dict(params)
    dparams["layers"] = jax.tree_util.tree_map(
        lambda a: _truncate_stacked(a, n_layers),
        params["layers"],
        is_leaf=lambda x: isinstance(x, QuantizedArray),
    )
    return draft, dparams


def _probs(logits, temperature, top_k):
    """Post-top-k sampling distribution (both models must use the SAME
    warp so the acceptance ratio compares like with like). At
    temperature 0 only argmaxes of these are used, so any positive
    temperature gives identical results — use 1.0 for stable softmax."""
    return logits_to_probs(
        logits, temperature if temperature > 0 else 1.0, top_k
    )


_SPEC_PROGRAM_CACHE: Dict[Tuple, Any] = {}


def make_speculative_decode(
    model: Transformer,
    draft_model: Transformer,
    num_tokens: int,
    spec_k: int = 4,
):
    """Cached per (model, draft, num_tokens, spec_k): each call would
    otherwise build a fresh closure → a fresh jit → a recompile (or a
    compile-cache round trip) on every ``generate_speculative``."""
    key = (id(model), id(draft_model), num_tokens, spec_k)
    fn = _SPEC_PROGRAM_CACHE.get(key)
    if fn is None:
        fn = _make_speculative_decode(
            model, draft_model, num_tokens, spec_k
        )
        _SPEC_PROGRAM_CACHE[key] = fn
    return fn


def _make_speculative_decode(
    model: Transformer,
    draft_model: Transformer,
    num_tokens: int,
    spec_k: int = 4,
):
    """Build a jitted speculative decode program emitting ``num_tokens``
    tokens per batch row (after the prefill token). Returns
    ``(tokens [B, num_tokens], cache, draft_cache, accept_stats)`` where
    ``accept_stats = (rounds, drafted, accepted)`` int32 scalars."""
    assert spec_k >= 1
    cap = num_tokens + spec_k + 1  # emission buffer, trimmed at the end

    @functools.partial(
        jax.jit, donate_argnums=(4, 5), static_argnums=(8, 9)
    )
    def spec_decode(
        params,
        draft_params,
        prev_token,           # [B] int32 — token at start_pos - 1
        first_token,          # [B] int32 — already emitted by the caller
        cache,
        draft_cache,
        start_pos,            # scalar or [B] int32: position of first_token
        key,
        temperature: float = 0.6,
        top_k: Optional[int] = None,
    ):
        B = first_token.shape[0]
        pos0 = jnp.asarray(start_pos, jnp.int32)
        if pos0.ndim == 0:
            pos0 = jnp.full((B,), pos0, jnp.int32)
        greedy = temperature == 0.0

        def _pick(p, rkey):
            if greedy:
                return jnp.argmax(p, axis=-1).astype(jnp.int32)
            q = jax.random.exponential(rkey, p.shape, jnp.float32)
            return jnp.argmax(p / q, axis=-1).astype(jnp.int32)

        def draft_round(dparams, prev, tok, dcache, pos, rkey):
            """k autoregressive draft steps. The FIRST step processes
            [prev, tok] (T=2): rewriting prev's kv is idempotent, and
            after a full-accept round it fills the draft-cache slot the
            draft never wrote (its own last proposal d_k — the target
            verified it, but the draft scan stopped at d_{k-1}'s kv).
            Returns proposed tokens [B, k], their sampling dists
            [k, B, V], updated cache."""
            two = jnp.stack([prev, tok], axis=1)  # [B, 2]
            logits, dcache = draft_model(dparams, two, pos - 1, dcache)
            p1 = _probs(logits[:, -1], temperature, top_k)  # [B, V]
            d1 = _pick(p1, jax.random.fold_in(rkey, 0))

            def step(carry, i):
                tok, dcache, pos = carry
                logits, dcache = draft_model(
                    dparams, tok[:, None], pos, dcache
                )
                p = _probs(logits[:, -1], temperature, top_k)  # [B, V]
                nxt = _pick(p, jax.random.fold_in(rkey, i))
                return (nxt, dcache, pos + 1), (nxt, p)

            (_, dcache, _), (toks, probs) = jax.lax.scan(
                step, (d1, dcache, pos + 1), jnp.arange(1, spec_k)
            )
            toks = jnp.concatenate([d1[None], toks], axis=0)
            probs = jnp.concatenate([p1[None], probs], axis=0)
            return toks.swapaxes(0, 1), probs, dcache  # [B,k], [k,B,V]

        def round_body(state):
            buf, counts, prev, cur, pos, cache, dcache, key, stats = state
            key, k_draft, k_acc, k_res = jax.random.split(key, 4)

            d_toks, d_probs, dcache = draft_round(
                draft_params, prev, cur, dcache, pos, k_draft
            )  # [B, k], [k, B, V]

            # verify: ONE target forward over [cur, d_1..d_k]
            tokens_in = jnp.concatenate([cur[:, None], d_toks], axis=1)
            logits, cache = model(params, tokens_in, pos, cache)
            t_probs = _probs(logits, temperature, top_k)  # [B, k+1, V]

            # acceptance test per draft position
            d_probs_bt = d_probs.swapaxes(0, 1)  # [B, k, V]
            p_d = jnp.take_along_axis(
                d_probs_bt, d_toks[:, :, None], axis=-1
            )[..., 0]  # [B, k]
            p_t = jnp.take_along_axis(
                t_probs[:, :spec_k], d_toks[:, :, None], axis=-1
            )[..., 0]  # [B, k]
            if greedy:
                tgt_argmax = jnp.argmax(
                    t_probs[:, :spec_k], axis=-1
                ).astype(jnp.int32)
                accept = d_toks == tgt_argmax  # [B, k]
            else:
                u = jax.random.uniform(k_acc, p_d.shape, jnp.float32)
                accept = u * p_d <= p_t
            keep = jnp.cumprod(accept.astype(jnp.int32), axis=1)  # [B, k]
            n_acc = jnp.sum(keep, axis=1)  # [B] in [0, k]

            # final token: residual resample at the rejection position,
            # or a bonus sample from the last target position if all kept
            resid = jnp.maximum(
                t_probs[:, :spec_k] - d_probs_bt, 0.0
            )  # [B, k, V]
            resid = resid / jnp.maximum(
                jnp.sum(resid, axis=-1, keepdims=True), 1e-20
            )
            # distribution to draw the final token from, per row:
            # n_acc < k -> resid[:, n_acc]; n_acc == k -> t_probs[:, k]
            all_dists = jnp.concatenate(
                [resid, t_probs[:, spec_k:]], axis=1
            )  # [B, k+1, V]
            final_dist = jnp.take_along_axis(
                all_dists, n_acc[:, None, None], axis=1
            )[:, 0]  # [B, V]
            if greedy:
                # rejection position: target argmax; bonus: also argmax
                final_src = jnp.take_along_axis(
                    t_probs, n_acc[:, None, None], axis=1
                )[:, 0]
                final = jnp.argmax(final_src, axis=-1).astype(jnp.int32)
            else:
                q = jax.random.exponential(
                    k_res, final_dist.shape, jnp.float32
                )
                final = jnp.argmax(final_dist / q, axis=-1).astype(
                    jnp.int32
                )

            # emitted this round: [d_1..d_n, final] (n+1 tokens), padded
            # to k+1; pad garbage is overwritten by the next round's write
            idx = jnp.arange(spec_k + 1)[None, :]  # [1, k+1]
            emit = jnp.where(
                idx < n_acc[:, None],
                jnp.concatenate(
                    [d_toks, jnp.zeros((B, 1), jnp.int32)], axis=1
                ),
                final[:, None],
            )  # [B, k+1]

            buf = jax.vmap(
                lambda b, e, c: jax.lax.dynamic_update_slice(b, e, (c,))
            )(buf, emit, counts)
            counts = counts + n_acc + 1
            # next round's prev = token at pos + n_acc (the one before
            # final): d_{n} if n >= 1, else cur
            prev = jnp.where(
                n_acc >= 1,
                jnp.take_along_axis(
                    d_toks,
                    jnp.maximum(n_acc - 1, 0)[:, None], axis=1
                )[:, 0],
                cur,
            )
            cur = final
            pos = pos + n_acc + 1
            rounds, drafted, accepted = stats
            stats = (
                rounds + 1,
                drafted + B * spec_k,
                accepted + jnp.sum(n_acc),
            )
            return (buf, counts, prev, cur, pos, cache, dcache, key, stats)

        def cond(state):
            counts = state[1]
            return jnp.min(counts) < num_tokens

        buf = jnp.zeros((B, cap), jnp.int32)
        counts = jnp.zeros((B,), jnp.int32)
        stats0 = (
            jnp.int32(0), jnp.int32(0), jnp.int32(0),
        )
        state = (
            buf, counts, prev_token, first_token, pos0, cache,
            draft_cache, key, stats0,
        )
        buf, counts, _, _, _, cache, draft_cache, _, stats = (
            jax.lax.while_loop(cond, round_body, state)
        )
        return buf[:, :num_tokens], cache, draft_cache, stats

    return spec_decode


def generate_speculative(
    model: Transformer,
    params: Dict[str, Any],
    draft_model: Transformer,
    draft_params: Dict[str, Any],
    prompt: jnp.ndarray,  # [B, T] int32
    max_new_tokens: int,
    *,
    spec_k: int = 4,
    temperature: float = 0.6,
    top_k: Optional[int] = 200,
    kv_cache_quantization: bool = False,
    key: Optional[jax.Array] = None,
    return_stats: bool = False,
):
    """Speculative analog of ``generate.generate``: returns
    ``[B, T_prompt + max_new_tokens]`` tokens (and, optionally, the
    acceptance stats ``{"rounds", "drafted", "accepted"}``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B, T = prompt.shape
    max_seq = T + max_new_tokens + spec_k + 1
    cache = model.setup_caches(B, max_seq, quantize=kv_cache_quantization)
    dcache = draft_model.setup_caches(
        B, max_seq, quantize=kv_cache_quantization
    )

    k1, k2, k3 = jax.random.split(key, 3)
    prefill = make_prefill(model)
    first, cache = prefill(params, prompt, cache, k1, temperature, top_k)
    dprefill = make_prefill(draft_model)
    _, dcache = dprefill(
        draft_params, prompt, dcache, k2, temperature, top_k
    )

    spec = make_speculative_decode(
        model, draft_model, max_new_tokens - 1, spec_k
    )
    rest, cache, dcache, stats = spec(
        params, draft_params, prompt[:, -1], first, cache, dcache, T, k3,
        temperature, top_k,
    )
    toks = jnp.concatenate([prompt, first[:, None], rest], axis=1)
    if return_stats:
        rounds, drafted, accepted = (int(s) for s in stats)
        return toks, {
            "rounds": rounds,
            "drafted": drafted,
            "accepted": accepted,
            "acceptance_rate": accepted / max(drafted, 1),
        }
    return toks
