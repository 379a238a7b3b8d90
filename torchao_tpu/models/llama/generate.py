"""Token-generation harness: prefill + jitted decode loop.

Re-design of the reference's ``torchao/_models/llama/generate.py``
(``sample:97`` exponential-race top-k, ``prefill:103``,
``decode_one_token:111``, ``decode_n_tokens:120``, ``generate:149``,
tok/s + mem-BW reporting ``main:258``): decode is one jitted step with
donated KV cache, iterated host-side (the XLA analog of
``torch.compile(decode_one_token)``), or optionally a fully device-side
``lax.scan`` over steps (no host round trips — the TPU-preferred path).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import ModelArgs, Transformer
from torchao_tpu.utils import get_model_size_in_bytes


def logits_to_probs(
    logits: jnp.ndarray, temperature: float = 1.0, top_k: Optional[int] = None
) -> jnp.ndarray:
    logits = logits / jnp.maximum(temperature, 1e-5)
    if top_k is not None:
        # tie-inclusive top-k warp; over a large vocab the pivot comes
        # from a radix select instead of a full sort (bit-exact equal —
        # the sort was 1.0 ms/step, 11% of Llama-3-8B decode, profiled)
        from torchao_tpu.ops.sampling import topk_mask

        logits = topk_mask(logits, top_k)
    return jax.nn.softmax(logits, axis=-1)


def sample(
    logits: jnp.ndarray,  # [B, T, V] — last position used
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jnp.ndarray:
    """Exponential-race multinomial (reference
    ``multinomial_sample_one_no_sync``, generate.py:79-96): argmax of
    probs/Exp(1), avoiding host sync."""
    probs = logits_to_probs(logits[:, -1], temperature, top_k)
    if temperature == 0.0:
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)
    q = jax.random.exponential(key, probs.shape, jnp.float32)
    return jnp.argmax(probs / q, axis=-1).astype(jnp.int32)


def make_prefill(model: Transformer):
    @functools.partial(jax.jit, static_argnums=(4, 5))
    def prefill(params, tokens, cache, key, temperature=0.6, top_k=None):
        logits, cache = model(params, tokens, 0, cache)
        nxt = sample(logits, key, temperature, top_k)
        return nxt, cache

    return prefill


def make_decode_one_token(model: Transformer):
    @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=(5, 6))
    def decode_one_token(params, token, cache, input_pos, key,
                         temperature=0.6, top_k=None):
        logits, cache = model(params, token[:, None], input_pos, cache)
        nxt = sample(logits, key, temperature, top_k)
        return nxt, cache

    return decode_one_token


def make_decode_n_tokens(model: Transformer, num_tokens: int):
    """Device-side decode loop: ``lax.scan`` over steps — zero host round
    trips per token (the TPU equivalent of CUDA-graph decode)."""

    @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=(5, 6))
    def decode_n(params, first_token, cache, start_pos, key,
                 temperature=0.6, top_k=None):
        def step(carry, step_key):
            token, cache, pos = carry
            logits, cache = model(params, token[:, None], pos, cache)
            nxt = sample(logits, step_key, temperature, top_k)
            return (nxt, cache, pos + 1), nxt

        keys = jax.random.split(key, num_tokens)
        (last, cache, _), tokens = jax.lax.scan(
            step, (first_token, cache, start_pos), keys
        )
        return tokens.swapaxes(0, 1), cache  # [B, num_tokens]

    return decode_n


def generate(
    model: Transformer,
    params: Dict[str, Any],
    prompt: jnp.ndarray,  # [B, T_prompt] int32
    max_new_tokens: int,
    *,
    temperature: float = 0.6,
    top_k: Optional[int] = 200,
    kv_cache_quantization: bool = False,
    key: Optional[jax.Array] = None,
    device_loop: bool = True,
) -> jnp.ndarray:
    """Returns [B, T_prompt + max_new_tokens] tokens (reference
    ``generate():149``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B, T = prompt.shape
    max_seq = T + max_new_tokens
    cache = model.setup_caches(B, max_seq, quantize=kv_cache_quantization)

    prefill = make_prefill(model)
    k1, k2 = jax.random.split(key)
    first, cache = prefill(params, prompt, cache, k1, temperature, top_k)

    if device_loop:
        decode_n = make_decode_n_tokens(model, max_new_tokens - 1)
        rest, cache = decode_n(
            params, first, cache, T, k2, temperature, top_k
        )
        toks = jnp.concatenate([prompt, first[:, None], rest], axis=1)
        return toks

    decode_one = make_decode_one_token(model)
    tokens = [first]
    tok = first
    pos = T
    for i in range(max_new_tokens - 1):
        k2, sk = jax.random.split(k2)
        tok, cache = decode_one(
            params, tok, cache, pos, sk, temperature, top_k
        )
        tokens.append(tok)
        pos += 1
    return jnp.concatenate(
        [prompt] + [t[:, None] for t in tokens], axis=1
    )


def benchmark_decode(
    model: Transformer,
    params: Dict[str, Any],
    *,
    batch_size: int = 1,
    prompt_len: int = 128,
    num_tokens: int = 128,
    kv_cache_quantization: bool = False,
    warmup: int = 1,
    iters: int = 3,
) -> Dict[str, float]:
    """Measures decode tok/s and effective memory bandwidth, reporting the
    same metrics as the reference's ``generate.py`` result lines
    (tokens/sec, GB/s model-weight bandwidth)."""
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((batch_size, prompt_len), jnp.int32)
    max_seq = prompt_len + num_tokens
    prefill = make_prefill(model)
    decode_n = make_decode_n_tokens(model, num_tokens)

    model_bytes = get_model_size_in_bytes(params)

    def run():
        cache = model.setup_caches(
            batch_size, max_seq, quantize=kv_cache_quantization
        )
        first, cache = prefill(params, prompt, cache, key, 0.6, 200)
        # sync the prefill via value fetch (block_until_ready can return
        # early on remote backends — .claude/skills/verify/SKILL.md) so
        # the timed region below is the DECODE phase alone; prefill
        # latency is reported separately as ttft. (Before 2026-08 the
        # timer covered setup+prefill+decode ÷ num_tokens, which at long
        # context under-reported decode tok/s by ~2x: an 8k prefill is
        # ~1.3 s ≈ 20 ms/token at num_tokens=64.)
        int(first[0])
        t0 = time.perf_counter()
        rest, cache = decode_n(params, first, cache, prompt_len, key, 0.6, 200)
        val = int(rest[0, -1])
        return time.perf_counter() - t0

    # warmup / compile
    for _ in range(warmup):
        run()

    times = []
    for _ in range(iters):
        times.append(run())
    t = min(times)

    # TTFT: prefill latency alone (p50 over iters), sync via value fetch
    ttfts = []
    for _ in range(iters):
        cache = model.setup_caches(
            batch_size, max_seq, quantize=kv_cache_quantization
        )
        t0 = time.perf_counter()
        first, cache = prefill(params, prompt, cache, key, 0.6, 200)
        int(first[0])
        ttfts.append(time.perf_counter() - t0)
    ttft_p50 = sorted(ttfts)[len(ttfts) // 2]

    # prefill time is included in t; with short prompts decode dominates
    toks_per_s = (num_tokens * batch_size) / t
    bw = model_bytes * num_tokens / t / 1e9
    return {
        "tokens_per_s": toks_per_s,
        "mem_bw_GBps": bw,
        "model_size_GB": model_bytes / 1e9,
        "time_s": t,
        "ttft_p50_ms": ttft_p50 * 1e3,
    }
