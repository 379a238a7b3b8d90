"""Tutorial: quantize a ViT image encoder.

Counterpart of the reference's ``tutorials/quantize_vit/run_vit_b_quant.py``
(torchvision ViT-b + int8dq + torch.compile): here the ViT is the SAM
image encoder and compilation is ``jax.jit`` — quantization is a pure
params transform, the model code never changes.

Run: python tutorials/quantize_vit/run_vit_b_quant.py  (tiny config;
pass --model vit_b for the real encoder on TPU)
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
)

import argparse
import time

import jax
if __import__("os").environ.get("TUTORIAL_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.sam import SamImageEncoder, sam_linear_filter
from torchao_tpu.quantization.quant_api import (
    Int8DynamicActivationInt8WeightConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_tiny_debug")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast smoke run)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model = SamImageEncoder.from_name(args.model, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(
        rs.randn(args.batch, model.args.img_size, model.args.img_size, 3),
        jnp.bfloat16,
    )

    # 1. baseline, jit-compiled
    f = jax.jit(lambda p, x: model(p, x))
    ref = f(params, x)
    t0 = time.perf_counter()
    ref = f(params, x)
    float(jnp.ravel(ref)[0])
    t_ref = time.perf_counter() - t0

    # 2. quantize_: int8 dynamic-act x int8 weight on attention + MLP
    qparams = quantize_(
        params, Int8DynamicActivationInt8WeightConfig(), sam_linear_filter
    )
    out = f(qparams, x)           # same jitted fn — params swap only
    t0 = time.perf_counter()
    out = f(qparams, x)
    float(jnp.ravel(out)[0])
    t_q = time.perf_counter() - t0

    sqnr = float(compute_error(ref, out))
    print(f"bf16: {t_ref*1e3:.1f} ms   int8dq: {t_q*1e3:.1f} ms   "
          f"SQNR {sqnr:.1f} dB")
    assert sqnr > 20
    print("OK")
