"""Round-4 headline A/B: PER-SHAPE block configs for the short launches.

The r4 ceiling probe (scripts/ceiling_probe_r4.py) measured the decode
launch structure's streaming ceiling at 644 GB/s with the real kernel at
96.5% of it; fresh profiler attribution shows the per-launch streaming
rate falls with launch length (head 754 GB/s at 126 grid steps, w13 712
at 28, w2 690 at 14, wqkv 628 at 6, wo 577 at 4) — classic fill/drain.
Shorter launches should amortize fill with FINER blocks (more, smaller
grid steps); the autotune cache is per-shape, so wo/wqkv can tune
independently of w13/w2. K blocks are pinned to multiples of the stored
qparams chunk (1024 packed rows), so only bn varies.

Writes one JSON line per variant (PERF.md methodology: e2e decode A/B in
one process).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception as e:
    print("compile cache not available:", e, flush=True)

import jax.numpy as jnp

from torchao_tpu.kernels import autotune
from torchao_tpu.models.llama.generate import make_decode_n_tokens, make_prefill
from torchao_tpu.models.llama.init_utils import init_quantized_params
from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

NUM_TOKENS = 128
PROMPT = 128
KV = "int4_smajor"

WQKV = (1, 6144, 4096, 32)
WO = (1, 4096, 4096, 32)
W13 = (1, 28672, 4096, 32)
W2 = (1, 4096, 14336, 32)
BASE = {"bn": 2048, "bkp": 1024, "variant": "batched_int8"}


def set_cache(per_shape):
    cache = autotune._load_cache()
    for shape in (WQKV, WO, W13, W2):
        key = autotune._key("int4_dq_matmul", shape)
        cfg = per_shape.get(shape, BASE)
        cache[key] = {"config": dict(cfg)}


def run_variant(name, model, params, prefill, per_shape):
    set_cache(per_shape)
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((1, PROMPT), jnp.int32)
    decode_n = make_decode_n_tokens(model, NUM_TOKENS)

    def once():
        cache = model.setup_caches(1, PROMPT + NUM_TOKENS, quantize=KV)
        first, cache = prefill(params, prompt, cache, key, 0.6, 200)
        int(first[0])
        t0 = time.perf_counter()
        rest, cache = decode_n(params, first, cache, PROMPT, key, 0.6, 200)
        int(rest[0, -1])
        return time.perf_counter() - t0

    try:
        t0 = time.perf_counter()
        once()
        compile_s = time.perf_counter() - t0
        t = min(once() for _ in range(2))
        print(json.dumps({
            "variant": name,
            "tok_s": round(NUM_TOKENS / t, 2),
            "step_ms": round(t / NUM_TOKENS * 1e3, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": name, "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)


def main():
    args = ModelArgs.from_name("Llama-3-8B")
    args.block_size = min(args.block_size, 4096)
    model = Transformer(args, dtype=jnp.bfloat16)
    t0 = time.time()
    params = init_quantized_params(
        model, Int4WeightOnlyConfig(group_size=32), default_linear_filter,
        jax.random.PRNGKey(0),
    )
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)
    prefill = make_prefill(model)

    bn = lambda n: {**BASE, "bn": n}
    variants = [
        ("base_2048", {}),
        ("short_bn1024", {WQKV: bn(1024), WO: bn(1024)}),
        ("short_bn512", {WQKV: bn(512), WO: bn(512)}),
        ("wo_only_bn1024", {WO: bn(1024)}),
        ("all_bn1024", {WQKV: bn(1024), WO: bn(1024),
                        W13: bn(1024), W2: bn(1024)}),
        ("base_again", {}),
    ]
    for name, per_shape in variants:
        run_variant(name, model, params, prefill, per_shape)


if __name__ == "__main__":
    main()
