"""Round-3 headline A/B sweep: per-grid-step streaming experiments.

Runs the full Llama-3-8B int4wo-g32 decode benchmark (the PERF.md-trusted
e2e methodology) across kernel pipeline variants in ONE process so the 8B
init (~80 s) and the prefill compile amortize across variants.

Variants probe the VERDICT r2 #1 levers:
  - pl.Buffered lookahead / deeper multiple-buffering on the weight streams
  - bigger DMA windows (bn=4096) via per-shape autotune-cache overrides
  - bkp=2048 retry with a raised scoped-VMEM limit

Writes one JSON line per variant to stdout (tee to a log).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: if the axon backend honors it, repeat A/Bs in
# later processes skip the 2-10 min remote compiles
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

LAYER_SHAPES = [  # decode-shaped autotune keys (M, N, K, g)
    (1, 6144, 4096, 32),
    (1, 4096, 4096, 32),
    (1, 28672, 4096, 32),
    (1, 4096, 14336, 32),
]

ENV_KNOBS = [
    "TORCHAO_TPU_INT4_BUFFERS",
    "TORCHAO_TPU_INT4_LOOKAHEAD",
    "TORCHAO_TPU_INT4_VMEM_MB",
]


def set_cache(cfg_or_none):
    cache = autotune._load_cache()
    for shape in LAYER_SHAPES:
        key = autotune._key("int4_dq_matmul", shape)
        if cfg_or_none is None:
            cache[key] = {
                "config": {
                    "bn": 2048, "bkp": 1024, "variant": "batched_int8"
                }
            }
        else:
            cache[key] = {"config": dict(cfg_or_none)}


def run_variant(name, model, params, prefill, env=None, cache_cfg=None):
    for k in ENV_KNOBS:
        os.environ.pop(k, None)
    if env:
        os.environ.update(env)
    set_cache(cache_cfg)

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
        t_compile0 = time.perf_counter()
        once()  # compile + warm
        compile_s = time.perf_counter() - t_compile0
        ts = [once() for _ in range(2)]
        t = min(ts)
        print(json.dumps({
            "variant": name, "tok_s": round(NUM_TOKENS / t, 2),
            "step_ms": round(t / NUM_TOKENS * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "env": env or {}, "cache": cache_cfg,
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": name, "error": f"{type(e).__name__}: {e}"[:400],
        }), flush=True)
    finally:
        for k in ENV_KNOBS:
            os.environ.pop(k, None)


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

    variants = [
        ("base", None, None),
        ("lookahead", {"TORCHAO_TPU_INT4_LOOKAHEAD": "1"}, None),
        ("buf4_look", {
            "TORCHAO_TPU_INT4_BUFFERS": "4",
            "TORCHAO_TPU_INT4_LOOKAHEAD": "1",
        }, None),
        ("bn4096", None,
         {"bn": 4096, "bkp": 1024, "variant": "batched_int8"}),
        ("bkp2048_vmem100", {"TORCHAO_TPU_INT4_VMEM_MB": "100"},
         {"bn": 2048, "bkp": 2048, "variant": "batched_int8"}),
        ("bn4096_buf3_look", {
            "TORCHAO_TPU_INT4_BUFFERS": "3",
            "TORCHAO_TPU_INT4_LOOKAHEAD": "1",
            "TORCHAO_TPU_INT4_VMEM_MB": "100",
        }, {"bn": 4096, "bkp": 1024, "variant": "batched_int8"}),
    ]
    for name, env, cache_cfg in variants:
        run_variant(name, model, params, prefill, env, cache_cfg)


if __name__ == "__main__":
    main()
