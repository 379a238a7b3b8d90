"""Llama generate/benchmark CLI.

API-parity with the reference's ``torchao/_models/llama/generate.py
main()`` (``:258-690``): the same ``-q`` recipe strings select configs,
tok/s + bandwidth + model-size results are printed and appended to
``benchmark_results.txt``.

Recipes (reference ``generate.py:356-690``):
  int8wo | int8dq | int4wo-<g> | int4wo-<g>-hqq | float8wo |
  float8dq-tensor | float8dq-row | fp6 | uintx-<n>-<g>[-hqq] |
  embed-int8wo | codebook | autoquant[-int4|-float8|-all] |
  8da4w-<g> | mx-fp8 | nvfp4
GPU-tensor-core-only recipes (marlin, sparse-marlin, gemlite) raise with
an explanation (SURVEY.md §2.7 non-goals).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp


def config_from_recipe(q: str):
    """Map a ``-q`` recipe string to a config (or autoquant marker)."""
    from torchao_tpu.quantization.granularity import PerRow, PerTensor
    from torchao_tpu.quantization.quant_api import (
        Float8DynamicActivationFloat8WeightConfig,
        Float8WeightOnlyConfig,
        FPXWeightOnlyConfig,
        Int4WeightOnlyConfig,
        Int8DynamicActivationInt4WeightConfig,
        Int8DynamicActivationInt8WeightConfig,
        Int8WeightOnlyConfig,
        UIntXWeightOnlyConfig,
    )

    if q == "int8wo":
        return Int8WeightOnlyConfig()
    if q == "int8dq":
        return Int8DynamicActivationInt8WeightConfig()
    if q == "int8dq_prefill_wo_decode":
        # reference generate.py:411: dynamic act-quant during prefill,
        # weight-only during decode (seq-len==1 skips the act quant)
        return Int8DynamicActivationInt8WeightConfig(
            weight_only_decode=True
        )
    if q.startswith("int4dq"):
        # reference generate.py:431 CUTLASS rowwise s8s4/s4s4: the nbits
        # suffix selects the ACTIVATION width (8 → W4A8, 4 → W4A4)
        from torchao_tpu.quantization.quant_api import (
            Int4DynamicActivationInt4WeightConfig,
        )

        nbits = int(q.split("-")[1]) if "-" in q else 8
        if nbits == 8:
            return Int8DynamicActivationInt4WeightConfig(group_size=32)
        if nbits == 4:
            return Int4DynamicActivationInt4WeightConfig()
        raise ValueError(f"int4dq activation bits must be 4 or 8: {q!r}")
    if q.startswith("int4wo"):
        parts = q.split("-")
        group = int(parts[1]) if len(parts) > 1 else 128
        return Int4WeightOnlyConfig(
            group_size=group, use_hqq=q.endswith("-hqq")
        )
    if q.startswith("8da4w"):
        parts = q.split("-")
        group = int(parts[1]) if len(parts) > 1 else 32
        return Int8DynamicActivationInt4WeightConfig(group_size=group)
    if q == "float8wo":
        return Float8WeightOnlyConfig()
    if q == "float8dq-tensor":
        return Float8DynamicActivationFloat8WeightConfig(
            granularity=PerTensor()
        )
    if q in ("float8dq-row", "float8dq"):
        return Float8DynamicActivationFloat8WeightConfig(
            granularity=PerRow()
        )
    if q == "fp6":
        return FPXWeightOnlyConfig(ebits=3, mbits=2)
    if q.startswith("uintx"):
        parts = q.split("-")
        nbits, group = int(parts[1]), int(parts[2])
        return UIntXWeightOnlyConfig(
            dtype=f"uint{nbits}", group_size=group,
            use_hqq=q.endswith("-hqq"),
        )
    if q == "codebook":
        from torchao_tpu.prototype.codebook import CodebookWeightOnlyConfig

        return CodebookWeightOnlyConfig()
    if q == "mx-fp8":
        from torchao_tpu.prototype.mx_formats import MXFPInferenceConfig

        return MXFPInferenceConfig()
    if q == "nvfp4":
        from torchao_tpu.prototype.mx_formats import NVFP4InferenceConfig

        return NVFP4InferenceConfig()
    if q == "embed-int8wo":
        # reference generate.py:604: int8 weight-only on the embedding
        # table only (equivalent to the --embed_int8wo flag)
        return ("embed-int8wo",)
    if q == "spinquant":
        # reference generate.py:598 → prototype/spinquant: Hadamard
        # rotations folded into the weights (R1/R2) + online R4
        return ("spinquant",)
    if q.startswith("awq"):
        # awq-uintx-<nbits>-<group>[-<calib_seqs>]
        # (reference generate.py:462-494 awq-uintx / awq-8da4w)
        parts = q.split("-")
        nbits = int(parts[2]) if len(parts) > 2 else 4
        group = int(parts[3]) if len(parts) > 3 else 64
        calib = int(parts[4]) if len(parts) > 4 else 2
        return ("awq", nbits, group, calib)
    if q.startswith("autoquant"):
        return ("autoquant", q)
    if "marlin" in q or "gemlite" in q or "sparse" in q:
        raise ValueError(
            f"{q!r} targets GPU tensor-core sparse/packed kernels with no "
            "TPU analog (no sparse MXU); use int4wo-<g> for the dense "
            "int4 path (SURVEY.md §2.7)."
        )
    raise ValueError(f"Unknown quantization recipe: {q!r}")


def main(argv=None):
    from torchao_tpu.models.llama.generate import benchmark_decode, generate
    from torchao_tpu.models.llama.model import (
        ModelArgs,
        Transformer,
        default_linear_filter,
    )
    from torchao_tpu.quantization.quant_api import quantize_

    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="Llama-3-8B")
    p.add_argument("--checkpoint_path", default=None,
                   help=".npz from scripts/convert_hf_checkpoint.py")
    p.add_argument("-q", "--quantization", default=None)
    p.add_argument(
        "--kv_cache_quantization", nargs="?", const=True, default=False,
        help="flag → int8 head-major; or a layout string: "
        "int8 | int4 | int8_smajor (S-major flat cache, fastest at "
        "long context via the block-diagonal-Q decode kernel)",
    )
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--prompt_len", type=int, default=128)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--num_samples", type=int, default=3)
    p.add_argument("--embed_int8wo", action="store_true")
    p.add_argument(
        "--sparsity", default=None,
        choices=["semi-structured", "semi-structured-mlp", "block"],
        help="prune weights before quantization (reference --sparsity; "
        "2:4 semantics — no sparse MXU, see SURVEY.md §2.7)",
    )
    p.add_argument("--write_result", default="benchmark_results.txt")
    p.add_argument("--block_size_cap", type=int, default=4096)
    p.add_argument("--prompt", default=None,
                   help="text prompt: tokenize, generate, print the "
                   "decoded completion (reference generate.py --prompt)")
    p.add_argument("--tokenizer_path", default=None,
                   help="tiktoken .model file for --prompt "
                   "(io.BpeTokenizer)")
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top_k", type=int, default=200)
    p.add_argument(
        "--speculate", type=int, default=0, metavar="N",
        help="speculative decoding with an early-exit self-draft built "
        "from the target's first N layers (shared embeddings/head; no "
        "separate draft checkpoint). Output distribution is exactly the "
        "target's (rejection sampling); speedup tracks draft/target "
        "agreement, so it needs real weights to pay off.",
    )
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft tokens per speculative round")
    args = p.parse_args(argv)

    margs = ModelArgs.from_name(args.model_name)
    margs.block_size = min(margs.block_size, args.block_size_cap)
    if args.quantization == "spinquant":
        # online R4 Hadamard before w2 (rotations folded into weights
        # by apply_spinquant below; the model must apply R4 at runtime)
        margs.use_r4_hadamard = True
    model = Transformer(margs, dtype=jnp.bfloat16)

    # leaf-by-leaf quantized init for random-weight runs with a plain
    # config: init_params + quantize_ materializes the full bf16 model
    # first (~16 GB for 8B — the whole v5e HBM; OOMs with int8-sized
    # quantized copies). Calibration/search flows and sparsity need the
    # hp weights and keep the two-step path.
    lean_cfg = None
    if (
        not args.checkpoint_path
        and not args.sparsity
        and args.quantization
        and not args.quantization.startswith(("autoquant", "int4wo-gptq"))
    ):
        c = config_from_recipe(args.quantization)
        if not isinstance(c, tuple):
            lean_cfg = c

    if args.checkpoint_path:
        from scripts.convert_hf_checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint_path)
    elif lean_cfg is not None:
        from torchao_tpu.models.llama.init_utils import (
            init_quantized_params,
        )

        params = init_quantized_params(
            model, lean_cfg, default_linear_filter, jax.random.PRNGKey(0)
        )
    else:
        params = model.init_params(jax.random.PRNGKey(0))

    if args.sparsity:
        from torchao_tpu.models.llama.model import ffn_only_filter
        from torchao_tpu.sparsity import (
            BlockSparseWeightConfig,
            SemiSparseWeightConfig,
            sparsify_,
        )

        if args.sparsity == "block":
            sp_cfg, sp_filter = BlockSparseWeightConfig(), default_linear_filter
        else:
            sp_cfg = SemiSparseWeightConfig()
            sp_filter = (
                ffn_only_filter
                if args.sparsity == "semi-structured-mlp"
                else default_linear_filter
            )
        params = sparsify_(params, sp_cfg, filter_fn=sp_filter)

    if lean_cfg is not None:
        pass  # already quantized at init
    elif args.quantization and args.quantization.startswith("int4wo-gptq"):
        # int4wo-gptq[-<g>]: sequential GPTQ calibration (random tokens
        # unless --calib_tokens provides a .npy stream)
        from torchao_tpu.quantization.gptq_llama import gptq_quantize_llama
        import numpy as np

        parts = args.quantization.split("-")
        g = int(parts[2]) if len(parts) > 2 else 64
        calib = jnp.asarray(
            np.random.RandomState(0).randint(
                0, margs.vocab_size, (4, 512)
            ),
            jnp.int32,
        )
        params = gptq_quantize_llama(model, params, calib, group_size=g)
    elif args.quantization:
        cfg = config_from_recipe(args.quantization)
        if isinstance(cfg, tuple) and cfg[0] == "embed-int8wo":
            from torchao_tpu.quantization.quant_api import (
                Int8WeightOnlyConfig,
            )

            params = quantize_(
                params, Int8WeightOnlyConfig(),
                filter_fn=lambda p, l: "tok_embeddings" in p,
            )
        elif isinstance(cfg, tuple) and cfg[0] == "spinquant":
            from torchao_tpu.prototype.spinquant import apply_spinquant

            params = apply_spinquant(
                params, jax.random.PRNGKey(0),
                r1=True, r2=True, r4=True,
                head_dim=margs.head_dim, n_head=margs.n_head,
                n_local_heads=margs.n_local_heads,
            )
        elif isinstance(cfg, tuple) and cfg[0] == "awq":
            _, nbits, group, calib_seqs = cfg
            from torchao_tpu.prototype.awq import (
                AWQConfig,
                convert_awq_,
                insert_awq_observers_,
            )
            from torchao_tpu.quantization.quant_api import (
                UIntXWeightOnlyConfig,
            )
            import numpy as np

            observed, _stats = insert_awq_observers_(
                params, filter_fn=default_linear_filter
            )
            calib = jnp.asarray(
                np.random.RandomState(0).randint(
                    0, margs.vocab_size, (calib_seqs, 128)
                ),
                jnp.int32,
            )
            # observers are host-side state: run the calibration
            # forward OUTSIDE jit (reference awq/api.py calibration)
            with jax.disable_jit():
                cache = model.setup_caches(calib_seqs, 128)
                model(observed, calib, 0, cache)
            params = convert_awq_(
                observed,
                AWQConfig(base_config=UIntXWeightOnlyConfig(
                    dtype=f"uint{nbits}", group_size=group,
                )),
            )
        elif isinstance(cfg, tuple):  # autoquant
            from torchao_tpu.quantization.autoquant import (
                all_autoquant_class_list,
                autoquant_,
                default_autoquant_class_list,
                default_int4_autoquant_class_list,
                default_float_autoquant_class_list,
            )

            flavor = cfg[1]
            lists = {
                "autoquant": default_autoquant_class_list(),
                "autoquant-int4": default_int4_autoquant_class_list(),
                "autoquant-float8": default_float_autoquant_class_list(),
                "autoquant-all": all_autoquant_class_list(),
            }
            params, decisions = autoquant_(
                params, lists.get(flavor, None),
                filter_fn=default_linear_filter,
            )
            print("autoquant decisions:", json.dumps(decisions, indent=1))
        else:
            params = quantize_(params, cfg, filter_fn=default_linear_filter)
            from torchao_tpu.models.llama.init_utils import (
                untie_quantized_head,
            )

            params = untie_quantized_head(params, margs, cfg)
    if args.embed_int8wo:
        from torchao_tpu.quantization.quant_api import Int8WeightOnlyConfig

        params = quantize_(
            params, Int8WeightOnlyConfig(),
            filter_fn=lambda p, l: "tok_embeddings" in p,
        )

    draft = dparams = None
    if args.speculate:
        from torchao_tpu.models.llama.speculative import early_exit_draft

        draft, dparams = early_exit_draft(model, params, args.speculate)

    if args.prompt is not None:
        from torchao_tpu.io.tokenizer import BpeTokenizer, train_byte_bpe

        if args.tokenizer_path:
            tok = BpeTokenizer.from_tiktoken_file(args.tokenizer_path)
        else:  # byte-level fallback: lossless, ids = raw bytes
            tok = BpeTokenizer(train_byte_bpe([], 256))
        ids = tok.encode(args.prompt)
        prompt_arr = jnp.asarray(ids, jnp.int32)[None, :] % margs.vocab_size
        if draft is not None:
            from torchao_tpu.models.llama.speculative import (
                generate_speculative,
            )

            out, stats = generate_speculative(
                model, params, draft, dparams, prompt_arr,
                args.max_new_tokens, spec_k=args.spec_k,
                temperature=args.temperature, top_k=args.top_k,
                kv_cache_quantization=args.kv_cache_quantization,
                return_stats=True,
            )
            print(f"speculative acceptance: "
                  f"{stats['acceptance_rate']:.1%} over "
                  f"{stats['rounds']} rounds")
        else:
            out = generate(
                model, params, prompt_arr, args.max_new_tokens,
                temperature=args.temperature, top_k=args.top_k,
                kv_cache_quantization=args.kv_cache_quantization,
            )
        new_ids = [int(t) for t in out[0, prompt_arr.shape[1]:]]
        if args.tokenizer_path:
            # real vocab: model ids map to token bytes
            print(args.prompt + tok.decode(new_ids))
        else:
            # byte-fallback tokenizer only covers ids < 256 — model ids
            # are NOT decodable; print them instead
            print(f"{args.prompt} → {len(new_ids)} token ids: "
                  f"{new_ids[:32]}")
        return {"tokens": new_ids}

    if draft is not None:
        from torchao_tpu.models.llama.speculative import (
            generate_speculative,
        )

        prompt_arr = jnp.zeros(
            (args.batch_size, args.prompt_len), jnp.int32
        )

        def run_spec():
            t0 = time.perf_counter()
            out, stats = generate_speculative(
                model, params, draft, dparams, prompt_arr,
                args.max_new_tokens, spec_k=args.spec_k,
                temperature=args.temperature, top_k=args.top_k,
                kv_cache_quantization=args.kv_cache_quantization,
                return_stats=True,
            )
            int(out[0, -1])
            return time.perf_counter() - t0, stats

        run_spec()  # compile
        dt, stats = run_spec()
        toks = args.max_new_tokens * args.batch_size
        line = (
            f"{time.strftime('%Y%m%d%H%M%S')}, tok/s={toks/dt:8.2f}, "
            f"speculative draft={args.speculate}L k={args.spec_k}, "
            f"acceptance={stats['acceptance_rate']:.3f}, "
            f"quant: {args.quantization}, model: {args.model_name}"
        )
        print(line)
        if args.write_result:
            with open(args.write_result, "a") as f:
                f.write(line + "\n")
        return {"tokens_per_s": toks / dt, **stats}

    res = benchmark_decode(
        model, params,
        batch_size=args.batch_size,
        prompt_len=args.prompt_len,
        num_tokens=args.max_new_tokens,
        kv_cache_quantization=args.kv_cache_quantization,
        iters=args.num_samples,
    )
    line = (
        f"{time.strftime('%Y%m%d%H%M%S')}, tok/s={res['tokens_per_s']:8.2f}, "
        f"mem/s={res['mem_bw_GBps']:8.2f} GB/s, "
        f"model_size={res['model_size_GB']:.2f} GB, "
        f"quant: {args.quantization}, model: {args.model_name}, "
        f"kv_quant: {args.kv_cache_quantization}, batch: {args.batch_size}"
    )
    print(line)
    if args.write_result:
        with open(args.write_result, "a") as f:
            f.write(line + "\n")
    return res


if __name__ == "__main__":
    main()
