"""Round-3 sweep C: stacked banded fat-dot decode variant e2e A/B.

Hypothesis (profile_decode r3): steady-state grid steps run ~9% over the
DMA ideal even on the head kernel; the batched variant issues ~66 MXU
ops per grid step (g-deep sub-dots). The banded variant issues ~6 fat
dots. Control = 127.7 tok/s (sweep A base, same session).
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
except Exception:
    pass

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

LAYER_SHAPES = [
    (1, 6144, 4096, 32),
    (1, 4096, 4096, 32),
    (1, 28672, 4096, 32),
    (1, 4096, 14336, 32),
]


def set_cache(cfg):
    cache = autotune._load_cache()
    for shape in LAYER_SHAPES:
        key = autotune._key("int4_dq_matmul", shape)
        cache[key] = {"config": dict(cfg)}


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
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((1, PROMPT), jnp.int32)

    for name, cfg in [
        ("banded_bkp1024_bn2048",
         {"bn": 2048, "bkp": 1024, "variant": "banded"}),
        ("banded_bkp2048_bn2048",
         {"bn": 2048, "bkp": 2048, "variant": "banded"}),
        ("banded_bkp1024_bn4096",
         {"bn": 4096, "bkp": 1024, "variant": "banded"}),
        ("control_bint8",
         {"bn": 2048, "bkp": 1024, "variant": "batched_int8"}),
    ]:
        set_cache(cfg)
        decode_n = make_decode_n_tokens(model, NUM_TOKENS)

        def once():
            cache = model.setup_caches(1, PROMPT + NUM_TOKENS, quantize=KV)
            first, cache = prefill(params, prompt, cache, key, 0.6, 200)
            int(first[0])
            t0 = time.perf_counter()
            rest, cache = decode_n(
                params, first, cache, PROMPT, key, 0.6, 200
            )
            int(rest[0, -1])
            return time.perf_counter() - t0

        try:
            t0 = time.perf_counter()
            once()
            compile_s = time.perf_counter() - t0
            t = min(once() for _ in range(2))
            print(json.dumps({
                "variant": name, "tok_s": round(NUM_TOKENS / t, 2),
                "step_ms": round(t / NUM_TOKENS * 1e3, 3),
                "compile_s": round(compile_s, 1), "cache": cfg,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "variant": name,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)


if __name__ == "__main__":
    main()
