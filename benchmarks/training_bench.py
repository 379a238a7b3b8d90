"""Training-step throughput benchmark: bf16 vs quantized-training recipes.

TPU counterpart of the reference's training benchmarks
(``torchao/float8/README.md`` speedup tables,
``benchmarks/quantized_training/``, ``benchmarks/float8/``): times one
full jitted train step (loss + grad + sgd update) of a small Llama under

  bf16 · float8 tensorwise · float8 rowwise · blockwise-fp8 (128×128)
  · int8 quantized-training · low-bit Adam (8-bit state)

and prints one JSON row per recipe with tokens/s and relative speed.
Note (PERF.md): v5e has no native fp8 arithmetic, so fp8 recipes here
measure the *overhead* of the cast numerics on this hardware, not the
H100 tensor-core speedups the reference reports.

Usage: python benchmarks/training_bench.py [--layers 4] [--dim 1024]
       [--seq 512] [--batch 4] [--iters 5]
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

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)


def _make_model(args):
    margs = ModelArgs(
        block_size=args.seq, vocab_size=2048, n_layer=args.layers,
        n_head=8, n_local_heads=8, dim=args.dim,
        intermediate_size=args.dim * 4,
    )
    model = Transformer(margs, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, margs


def _time_step(model, params, toks, iters, opt_update=None):
    def loss_fn(p):
        logits, _ = model(p, toks[:, :-1])
        tgt = toks[:, 1:]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(
            jnp.take_along_axis(lp, tgt[..., None], axis=-1)
        )

    if opt_update is None:
        @jax.jit
        def step(p):
            l, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree_util.tree_map(
                lambda w, gw: w - 1e-3 * gw.astype(w.dtype)
                if hasattr(w, "dtype") else w,
                p, g,
            )
            return l, p
        carry = params
        l, carry = step(carry)           # compile
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            l, carry = step(carry)
        _ = float(l)
    else:
        step, carry = opt_update(loss_fn, params)
        l, carry = step(carry)
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            l, carry = step(carry)
        _ = float(l)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    model, params, margs = _make_model(args)
    rs = np.random.RandomState(0)
    toks = jnp.asarray(
        rs.randint(0, margs.vocab_size, (args.batch, args.seq)),
        jnp.int32,
    )
    tokens_per_step = args.batch * (args.seq - 1)

    from torchao_tpu.float8 import (
        Float8LinearConfig,
        convert_to_float8_training,
    )
    from torchao_tpu.prototype.blockwise_fp8 import (
        convert_to_blockwise_fp8_training,
    )
    from torchao_tpu.prototype.quantized_training import (
        Int8WeightOnlyQuantizedTrainingConfig,
    )
    from torchao_tpu.quantization.quant_api import quantize_

    def f8(recipe):
        return lambda p: convert_to_float8_training(
            p,
            config=Float8LinearConfig.from_recipe_name(recipe),
            filter_fn=default_linear_filter,
        )

    recipes = {
        "bf16": lambda p: p,
        "float8_tensorwise": f8("tensorwise"),
        "float8_rowwise": f8("rowwise"),
        "blockwise_fp8_128": lambda p: convert_to_blockwise_fp8_training(
            p, default_linear_filter, block_size=128
        ),
        "int8_quantized_training": lambda p: quantize_(
            p, Int8WeightOnlyQuantizedTrainingConfig(),
            default_linear_filter,
        ),
    }

    base = None
    for name, fn in recipes.items():
        try:
            qp = fn(params)
            dt = _time_step(model, qp, toks, args.iters)
        except Exception as e:
            print(json.dumps({"recipe": name, "error": str(e)[:120]}),
                  flush=True)
            continue
        tok_s = tokens_per_step / dt
        if base is None:
            base = tok_s
        print(json.dumps({
            "recipe": name,
            "layers": args.layers, "dim": args.dim,
            "batch": args.batch, "seq": args.seq,
            "step_ms": round(dt * 1e3, 2),
            "tok_s": round(tok_s, 1),
            "rel_vs_bf16": round(tok_s / base, 3),
        }), flush=True)

    # low-bit Adam: optimizer-state memory + step time vs plain Adam
    import optax

    from torchao_tpu.optim import Adam8bit

    for opt_name, opt in (
        ("adam_fp32_state", optax.adam(1e-3)),
        ("adam_8bit_state", Adam8bit(1e-3)),
    ):
        def opt_update(loss_fn, p0, _opt=opt):
            state0 = _opt.init(p0)

            @jax.jit
            def step(carry):
                p, s = carry
                l, g = jax.value_and_grad(loss_fn)(p)
                upd, s = _opt.update(g, s, p)
                return l, (optax.apply_updates(p, upd), s)
            return step, (p0, state0)

        try:
            dt = _time_step(model, params, toks, args.iters,
                            opt_update=opt_update)
        except Exception as e:
            print(json.dumps({"recipe": opt_name,
                              "error": str(e)[:120]}), flush=True)
            continue
        # optimizer-state footprint (the low-bit-Adam headline metric:
        # reference benchmarks/benchmark_low_bit_adam.py)
        state_bytes = sum(
            l.size * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(opt.init(params))
            if hasattr(l, "dtype")
        )
        print(json.dumps({
            "recipe": opt_name,
            "step_ms": round(dt * 1e3, 2),
            "tok_s": round(tokens_per_step / dt, 1),
            "opt_state_MB": round(state_bytes / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
