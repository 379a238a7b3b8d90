#!/bin/bash
# Benchmark repro commands (the analog of the reference's
# torchao/_models/llama/benchmark_results.txt repro lines + evals.sh).
# All runs append result lines to benchmark_results.txt.
set -x

# headline: Llama-3-8B int4wo g=32 decode (driver metric)
python bench.py

# per-config decode sweep (BASELINE configs 2-4 + the W4A8 kernel path)
python benchmarks/llama_configs_bench.py \
    --recipes int8wo,int8dq,float8dq-row,8da4w-32

# continuous-batching aggregate throughput
python benchmarks/serving_bench.py --slots 4 --requests 8 --new-tokens 64

# SAM sparsity table (reference torchao/sparsity/README.md:25-29)
python benchmarks/sam_bench.py --model vit_b --batch 8

# training-step recipes (bf16 / fp8 / blockwise-fp8 / int8-QT / low-bit Adam)
python benchmarks/training_bench.py

# generate-CLI forms (same -q strings as the reference)
python -m torchao_tpu.models.llama.cli -q int4wo-32 --model_name Llama-3-8B
python -m torchao_tpu.models.llama.cli -q int4wo-32 --kv_cache_quantization \
    --model_name Llama-3-8B
python -m torchao_tpu.models.llama.cli -q int8wo --model_name Llama-3-8B

# microbenchmarks
python benchmarks/microbenchmarks/benchmark_runner.py \
    --config benchmarks/microbenchmarks/example.yml

# perplexity (requires a converted checkpoint + token file; zero-egress
# environments must provide them out of band):
#   python scripts/convert_hf_checkpoint.py --checkpoint_dir <hf> --out ckpt.npz
#   python -c "from torchao_tpu.models.llama.eval import evaluate_ppl; ..."
