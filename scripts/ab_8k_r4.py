"""Round-4 8k-context A/B: fused KV write for scalar positions.

The round-4 8k profile (prompt 7936) attributed ~0.5 ms/step to TWO
full cache-slab copies per layer-step: the scalar-position k_q/v_q
dynamic_update_slice into the scan-carried stacked cache doesn't alias
in front of the Pallas attention custom call (S-scaled — invisible at
short ctx). Fix: scalar decode rides the fused per-slot KV-write kernel
(broadcast positions, input_output_aliases in-place). This sweep
A/Bs it at 8k and short ctx, plus the attention S-block knob.

One JSON line per variant.
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

from torchao_tpu.models.llama.generate import make_decode_n_tokens, make_prefill
from torchao_tpu.models.llama.init_utils import init_quantized_params
from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.quantization.quant_api import Int4WeightOnlyConfig

NUM_TOKENS = 128
KV = "int4_smajor"
ENV_KNOBS = [
    "TORCHAO_TPU_DISABLE_FUSED_KV_WRITE",
    "TORCHAO_TPU_ATTN_BS",
]


def run_variant(name, model, params, prompt_len, env):
    for k in ENV_KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    key = jax.random.PRNGKey(0)
    prompt = jnp.zeros((1, prompt_len), jnp.int32)
    prefill = make_prefill(model)
    decode_n = make_decode_n_tokens(model, NUM_TOKENS)

    def once():
        cache = model.setup_caches(
            1, prompt_len + NUM_TOKENS, quantize=KV
        )
        first, cache = prefill(params, prompt, cache, key, 0.6, 200)
        int(first[0])
        t0 = time.perf_counter()
        rest, cache = decode_n(
            params, first, cache, prompt_len, key, 0.6, 200
        )
        int(rest[0, -1])
        return time.perf_counter() - t0

    try:
        t0 = time.perf_counter()
        once()
        compile_s = time.perf_counter() - t0
        t = min(once() for _ in range(2))
        print(json.dumps({
            "variant": name, "prompt": prompt_len,
            "tok_s": round(NUM_TOKENS / t, 2),
            "step_ms": round(t / NUM_TOKENS * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "env": env,
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": name, "prompt": prompt_len,
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)
    finally:
        for k in ENV_KNOBS:
            os.environ.pop(k, None)


def main():
    args = ModelArgs.from_name("Llama-3-8B")
    model = Transformer(args, dtype=jnp.bfloat16)
    t0 = time.time()
    params = init_quantized_params(
        model, Int4WeightOnlyConfig(group_size=32), default_linear_filter,
        jax.random.PRNGKey(0),
    )
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)

    P8K = 7936
    variants = [
        ("8k_control_dus", P8K,
         {"TORCHAO_TPU_DISABLE_FUSED_KV_WRITE": "1"}),
        ("8k_fused_write", P8K, {}),
        ("8k_fused_bs512", P8K, {"TORCHAO_TPU_ATTN_BS": "512"}),
        ("8k_fused_bs2048", P8K, {"TORCHAO_TPU_ATTN_BS": "2048"}),
        ("short_control_dus", 128,
         {"TORCHAO_TPU_DISABLE_FUSED_KV_WRITE": "1"}),
        ("short_fused_write", 128, {}),
    ]
    for name, plen, env in variants:
        run_variant(name, model, params, plen, env)


if __name__ == "__main__":
    main()
