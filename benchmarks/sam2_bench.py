"""SAM2 video-propagation quantization benchmark.

The SAM2 counterpart of ``sam_bench.py``: runs the video predictor
(per-frame encoder → memory-bank cross-attention → mask decoder) over a
short clip under bf16 vs int8dq on every linear, reporting frames/s and
mask-logit SQNR vs the bf16 run (the accuracy proxy available without
checkpoints/datasets — COVERAGE.md SAM2 scope decision). Exercises the
full quantization surface the reference's SAM2 benchmarks touch:
attention/MLP linears in the encoder, memory attention, and the two-way
mask decoder.

Usage: python benchmarks/sam2_bench.py [--encoder vit_b] [--frames 4]
       [--batch 1] [--size 256] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.sam2 import (
    SAM2Args,
    SAM2VideoPredictor,
    sam2_linear_filter,
)
from torchao_tpu.quantization.quant_api import (
    Int8DynamicActivationInt8WeightConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vit_b")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    if args.small:
        sargs = SAM2Args(encoder="vit_tiny_debug")
        args.size = 64
    else:
        sargs = SAM2Args(
            encoder=args.encoder, mem_dim=64, num_mem_layers=4,
            num_dec_layers=2, num_heads=8,
        )
    model = SAM2VideoPredictor(sargs, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    frames = jax.random.uniform(
        jax.random.PRNGKey(1),
        (args.frames, args.batch, args.size, args.size, 3),
        jnp.bfloat16,
    )

    def run(p):
        t0 = time.perf_counter()
        masks, ious = model.propagate_in_video(p, frames)
        float(jnp.sum(masks.astype(jnp.float32)))
        return time.perf_counter() - t0, masks

    results = {}
    _, ref_masks = run(params)  # compile + reference output
    ts = [run(params)[0] for _ in range(args.iters)]
    results["bf16"] = {
        "frames_per_s": round(args.frames * args.batch / min(ts), 3)
    }

    qparams = quantize_(
        params, Int8DynamicActivationInt8WeightConfig(),
        filter_fn=sam2_linear_filter,
    )
    _, q_masks = run(qparams)
    ts = [run(qparams)[0] for _ in range(args.iters)]
    results["int8dq"] = {
        "frames_per_s": round(args.frames * args.batch / min(ts), 3),
        "mask_logit_sqnr_db": round(
            float(compute_error(
                ref_masks.astype(jnp.float32), q_masks.astype(jnp.float32)
            )), 1,
        ),
    }
    print(json.dumps({
        "metric": "sam2_video_propagation",
        "encoder": sargs.encoder,
        "frames": args.frames,
        "batch": args.batch,
        "size": args.size,
        **results,
    }))


if __name__ == "__main__":
    main()
