"""fp6 e2e: hardware kernel parity check + Llama-3-8B fp6 decode bench.

The VERDICT r2 #2 row: reference fp6-LLM runs 161.58 tok/s on A100;
round-2 here was 13.54 tok/s through the XLA dequant fallback (which
also paid the scan-slice copy tax). This measures the fused Pallas fp6
kernel end-to-end.
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
import numpy as np

from torchao_tpu.kernels.fp6_matmul import (
    fp6_dq_matmul,
    fp6_dq_matmul_reference,
    pack_fp6_kmajor,
)
from torchao_tpu.quantization import quant_primitives as qp


def hw_parity():
    N, K = 2048, 4096
    w = jax.random.normal(jax.random.PRNGKey(0), (N, K), jnp.float32)
    scale = qp.choose_qparams_affine_floatx(w, 3, 2)
    codes = qp.exmy_encode(qp.quantize_affine_floatx(w, scale, 3, 2), 3, 2)
    s4, s2 = jax.jit(pack_fp6_kmajor)(codes)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)

    t0 = time.time()
    out = np.asarray(jax.jit(
        lambda x: fp6_dq_matmul(x, s4, s2, scale)
    )(x), np.float32)
    print(json.dumps({"hw_compile_s": round(time.time() - t0, 1)}),
          flush=True)
    ref = np.asarray(jax.jit(
        lambda x: fp6_dq_matmul_reference(x, s4, s2, scale)
    )(x), np.float32)
    rel = float(np.abs(out - ref).max() / np.abs(ref).max())
    print(json.dumps({"hw_rel_err": rel}), flush=True)
    assert rel < 0.02, rel


def e2e():
    from torchao_tpu.models.llama.generate import benchmark_decode
    from torchao_tpu.models.llama.init_utils import init_quantized_params
    from torchao_tpu.models.llama.model import (
        ModelArgs,
        Transformer,
        default_linear_filter,
    )
    from torchao_tpu.quantization.quant_api import FPXWeightOnlyConfig

    args = ModelArgs.from_name("Llama-3-8B")
    args.block_size = min(args.block_size, 4096)
    model = Transformer(args, dtype=jnp.bfloat16)
    t0 = time.time()
    params = init_quantized_params(
        model, FPXWeightOnlyConfig(ebits=3, mbits=2),
        default_linear_filter, jax.random.PRNGKey(0),
    )
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)
    res = benchmark_decode(
        model, params, batch_size=1, prompt_len=128, num_tokens=128,
        kv_cache_quantization="int4_smajor", iters=2,
    )
    from torchao_tpu.utils import get_model_size_in_bytes

    line = {
        "fp6_tok_s": round(res["tokens_per_s"], 2),
        "model_size_GB": round(res["model_size_GB"], 3),
        "ttft_p50_ms": round(res["ttft_p50_ms"], 1),
        "eff_bw_GBps": round(
            res["tokens_per_s"] * res["model_size_GB"], 1
        ),
    }
    print(json.dumps(line), flush=True)
    with open("benchmark_results.txt", "a") as f:
        f.write(
            f"{time.strftime('%Y%m%d%H%M%S')}, "
            f"tok/s={res['tokens_per_s']:8.2f}, "
            f"mem/s={res['mem_bw_GBps']:8.2f} GB/s, "
            f"model_size={res['model_size_GB']:.2f} GB, "
            f"quant: fp6 (dual-plane exact, int4+int8 kernels), model: Llama-3-8B, "
            f"kv_quant: int4_smajor, batch: 1\n"
        )


if __name__ == "__main__":
    hw_parity()
    e2e()
