"""SAM image-encoder benchmark: the reference's sparsity table.

Reproduces ``torchao/sparsity/README.md:25-29`` (SAM ViT-h bs=32 on
A100: bf16 / int8dq / 2:4-sparse(mlp) / int8dq+2:4 mixed) on TPU.
Reports img/s, relative speedup, and encoder-output SQNR vs bf16 (the
accuracy proxy available without the COCO mIoU harness — zero-egress
environment).

Usage: python benchmarks/sam_bench.py [--model vit_b] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

try:  # persistent compile cache (works over the axon tunnel)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.sam import (
    SamImageEncoder,
    benchmark_images_per_s,
    sam_linear_filter,
)
from torchao_tpu.quantization.granularity import PerRow
from torchao_tpu.quantization.quant_api import (
    Float8DynamicActivationFloat8WeightConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.sparsity import SemiSparseWeightConfig, sparsify_
from torchao_tpu.utils import compute_error


def _mlp_filter(path, leaf):
    return sam_linear_filter(path, leaf) and (
        "fc1" in path or "fc2" in path
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--recipes", default="",
        help="comma list to run (default: the reference sparsity table)",
    )
    args = ap.parse_args()

    model = SamImageEncoder.from_name(args.model, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    probe = jnp.asarray(
        rs.randn(1, model.args.img_size, model.args.img_size, 3),
        jnp.bfloat16,
    )
    ref_out = model(params, probe)

    recipes = {
        "bf16": lambda p: p,
        "int8dq": lambda p: quantize_(
            p, Int8DynamicActivationInt8WeightConfig(), sam_linear_filter
        ),
        "sparse24_mlp": lambda p: sparsify_(
            p, SemiSparseWeightConfig(), _mlp_filter
        ),
        "int8dq_sparse24": lambda p: quantize_(
            sparsify_(p, SemiSparseWeightConfig(), _mlp_filter),
            Int8DynamicActivationInt8WeightConfig(),
            sam_linear_filter,
        ),
        # pure memory plays (VERDICT r4 #4: does ANY quant config win at
        # ViT shapes, or is the encoder compute-bound everywhere?)
        "int8wo": lambda p: quantize_(
            p, Int8WeightOnlyConfig(), sam_linear_filter
        ),
        "fp8dq-row": lambda p: quantize_(
            p,
            Float8DynamicActivationFloat8WeightConfig(
                granularity=PerRow()
            ),
            sam_linear_filter,
        ),
        "int4wo-32": lambda p: quantize_(
            p, Int4WeightOnlyConfig(group_size=32),
            # weights may be layer-stacked [L, out, in]: gate on the
            # matmul dims (last two), not the stack dim
            lambda path, w: sam_linear_filter(path, w)
            and min(w.shape[-2:]) >= 32 and w.shape[-1] % 32 == 0,
        ),
    }
    if args.recipes:
        want = ["bf16"] + args.recipes.split(",")
        recipes = {k: v for k, v in recipes.items() if k in want}

    base_ips = None
    for name, fn in recipes.items():
        qp = fn(params)
        ips = benchmark_images_per_s(
            model, qp, batch_size=args.batch, iters=args.iters
        )
        out = model(qp, probe)
        sqnr = float(compute_error(ref_out, out)) if name != "bf16" else None
        if base_ips is None:
            base_ips = ips
        print(json.dumps({
            "recipe": name,
            "model": args.model,
            "batch": args.batch,
            "img_s": round(ips, 2),
            "rel_speedup": round(ips / base_ips, 3),
            "sqnr_vs_bf16_db": round(sqnr, 1) if sqnr is not None else None,
        }), flush=True)


if __name__ == "__main__":
    main()
