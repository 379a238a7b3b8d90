"""Round-3 8k-context sweep: attention S-block size A/B at prompt 7936.

VERDICT r2 #4: 118.15 tok/s at 8k vs the 125 target; fresh profiling
shows the gap vs short context is almost entirely the bdq attention
(0.62 ms/step = 53% streaming at bs=1024, 8 grid steps per layer launch
→ ~2 steps of fill/drain). Sweep bs.
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

from torchao_tpu.models.llama.generate import make_decode_n_tokens, make_prefill
from torchao_tpu.models.llama.init_utils import init_quantized_params
from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

NUM_TOKENS = 64
PROMPT = 7936
KV = "int4_smajor"


def main():
    args = ModelArgs.from_name("Llama-3-8B")
    args.block_size = min(args.block_size, PROMPT + NUM_TOKENS)
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

    for bs in (1024, 2048, 4096):
        os.environ["TORCHAO_TPU_ATTN_BS"] = str(bs)
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
            t = min(once() for _ in range(3))
            print(json.dumps({
                "attn_bs": bs, "tok_s": round(NUM_TOKENS / t, 2),
                "step_ms": round(t / NUM_TOKENS * 1e3, 3),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "attn_bs": bs, "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
    os.environ.pop("TORCHAO_TPU_ATTN_BS", None)


if __name__ == "__main__":
    main()
