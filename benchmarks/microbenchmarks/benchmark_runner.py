"""Microbenchmark YAML runner.

Equivalent of the reference's ``benchmarks/microbenchmarks``: a YAML
config lists (shape, quantization recipe) matrix entries; each is timed
through ``ops.linear`` and results stream to JSON (the format the CI
dashboard runner ``ci_microbenchmark_runner.py`` consumes).

Usage: python benchmarks/microbenchmarks/benchmark_runner.py --config cfg.yml
YAML schema:
  benchmarks:
    - name: int4wo_llama_ffn
      recipe: int4wo-32        # generate.py -q recipe string
      shapes: [[8, 14336, 4096]]   # [M, N, K]
      iters: 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

import jax
import jax.numpy as jnp
import numpy as np


def run_one(recipe: str, M: int, N: int, K: int, iters: int = 10):
    from torchao_tpu import ops
    from torchao_tpu.models.llama.cli import config_from_recipe
    from torchao_tpu.quantization.quant_api import quantize_
    from torchao_tpu.utils import compute_error

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(N, K), jnp.bfloat16)
    x = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    ref = jnp.matmul(x, w.T)

    if recipe in (None, "bf16", "none"):
        qw = w
    else:
        qw = quantize_({"w": w}, config_from_recipe(recipe))["w"]

    f = jax.jit(lambda x, w: ops.linear(x, w))
    out = f(x, qw)
    sqnr = compute_error(ref, out) if recipe not in (None, "bf16", "none") else None
    float(jnp.ravel(out)[0])  # sync (see verify skill: fetch, not block)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x, qw)
    float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return {
        "recipe": recipe, "M": M, "N": N, "K": K,
        "time_us": round(dt * 1e6, 1),
        "tflops": round(2 * M * N * K / dt / 1e12, 3),
        "sqnr_db": None if sqnr is None else round(sqnr, 1),
    }


def main(argv=None):
    import yaml

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    cfg = yaml.safe_load(open(args.config))
    results = []
    for entry in cfg["benchmarks"]:
        for (M, N, K) in entry["shapes"]:
            r = run_one(
                entry.get("recipe"), M, N, K, entry.get("iters", 10)
            )
            r["name"] = entry["name"]
            results.append(r)
            print(json.dumps(r), flush=True)
    if args.output:
        json.dump(results, open(args.output, "w"), indent=1)


if __name__ == "__main__":
    main()
