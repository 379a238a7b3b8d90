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
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.sam import (
    SamImageEncoder,
    benchmark_images_per_s,
    sam_linear_filter,
)
from torchao_tpu.quantization.quant_api import (
    Int8DynamicActivationInt8WeightConfig,
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
    }

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
