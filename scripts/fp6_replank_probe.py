"""fp6 load-time replank measurement (VERDICT r4 next #9).

The fp6 trade on this platform, stated square-on:

  at-rest (checkpoint / FloatxArray kmajor shards):   6 bits/weight
  dual-plane serving form (Fp6DualArray, HBM):       12 bits/weight
  serving the true 6-bit form directly:              13.5 tok/s (VPU
      in-kernel decode floor, PERF.md round-3 bisect)
  serving the dual-plane form:                       57.6 tok/s

The untried middle form the verdict asked to evaluate: STORE 6-bit,
replank to dual-plane ONCE AT LOAD (startup cost, not per-step) — so
checkpoints keep fp6's size advantage while serving runs at 57.6.
This measures that replank cost on hardware for the Llama-3-8B w13
stack (the largest leaf) and extrapolates linearly to the full model.

One JSON line.
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

from torchao_tpu.quantization.quant_api import FPXWeightOnlyConfig
from torchao_tpu.quantization.transform_module import get_quantize_handler


def main():
    # a QUARTER of the 8B w13 stack: the full [32, 28672, 4096] leaf's
    # quantize temps exceed HBM in one jit (the model init quantizes in
    # chunks for the same reason — init_utils); replank/quantize are
    # bytes-linear so the full-model number extrapolates
    L, N, K = 8, 28672, 4096
    # runtime="packed": the true 6-bit at-rest form (what a checkpoint
    # stores); the default "dual" would replank at quantize time
    cfg = FPXWeightOnlyConfig(ebits=3, mbits=2, runtime="packed")
    handler = get_quantize_handler(cfg)

    w = (
        jax.random.normal(jax.random.PRNGKey(0), (L, N, K), jnp.float32)
        * 0.02
    ).astype(jnp.bfloat16)
    t0 = time.time()
    fx = jax.jit(lambda w: handler(w, cfg))(w)
    jax.block_until_ready(fx)
    quant_s = time.time() - t0
    atrest_bits = fx.nbytes() * 8 / (L * N * K)

    # the measured one-time load step: 6-bit shards -> dual planes.
    # SYNC RULE (CLAUDE.md): block_until_ready may return early over the
    # axon tunnel — always fetch a VALUE to fence the timing.
    def _fence(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    replank = jax.jit(lambda a: a.to_dual_planes())
    t0 = time.time()
    dual = replank(fx)
    _fence(dual)
    first_s = time.time() - t0  # includes compile
    t0 = time.time()
    dual = replank(fx)
    _fence(dual)
    steady_s = time.time() - t0
    dual_bits = dual.nbytes() * 8 / (L * N * K)

    leaf_params = L * N * K
    model_params = 7.5e9  # 8B quantized-linear params
    out = {
        "probe": "fp6_load_time_replank",
        "leaf": f"w13 [{L},{N},{K}]",
        "quantize_s": round(quant_s, 2),
        "replank_first_s": round(first_s, 2),
        "replank_steady_s": round(steady_s, 2),
        "replank_full_model_est_s": round(
            steady_s * model_params / leaf_params, 2
        ),
        "at_rest_bits_per_weight": round(atrest_bits, 2),
        "dual_plane_bits_per_weight": round(dual_bits, 2),
        "verdict": (
            "store 6-bit, replank at load: full-8B one-time cost "
            "measured below; HBM residency during serving is the "
            "12-bit dual form either way"
        ),
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/fp6_replank.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
