"""Benchmark: Llama-3-8B int4 weight-only (g=32) decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N/180.8}

Baseline: the reference's Llama-3-8B int4wo-64 decode on A100-80GB =
180.80 tok/s (BASELINE.md, torchao/quantization/README.md:20).

Weights are random (throughput is weight-value-independent); params are
initialized and quantized one stacked tensor at a time inside jit so the
full bf16 model is never materialized (v5e has 16 GB HBM).

Env overrides: BENCH_MODEL (default Llama-3-8B), BENCH_NUM_TOKENS,
BENCH_PROMPT, BENCH_BATCH, BENCH_SMALL=1 (tiny config smoke mode).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_TOK_S = 180.80


def init_quantized_llama(model, config, filter_fn, key):
    """Init + quantize leaf-by-leaf under jit (moved to
    torchao_tpu.models.llama.init_utils; thin alias kept for scripts)."""
    from torchao_tpu.models.llama.init_utils import init_quantized_params

    return init_quantized_params(model, config, filter_fn, key)


def measure_device_bandwidth_gbps() -> float:
    """Effective HBM read bandwidth via a looped 117MB reduction (this
    virtualized v5e slice measures ~110 GB/s vs a full chip's 819)."""
    import jax.numpy as jnp

    w = jax.random.normal(
        jax.random.PRNGKey(0), (4096, 14336), jnp.bfloat16
    )

    @jax.jit
    def red(w, s0):
        def body(i, s):
            return s + jnp.sum(w * (1.0 + s * 1e-30), dtype=jnp.float32)

        return jax.lax.fori_loop(0, 20, body, s0)

    float(red(w, jnp.float32(0)))  # compile+sync via value fetch
    t0 = time.time()
    float(red(w, jnp.float32(0)))
    dt = (time.time() - t0) / 20
    return w.size * 2 / dt / 1e9


def weight_read_bytes_per_token(params) -> int:
    """Bytes actually streamed per decode token: all layer weights + the
    output head (embedding contributes one row — negligible).

    Quantized arrays carrying precomputed kernel-form qparams
    (``qparams_eff``) stream ONLY those in the decode kernels;
    the raw ``scale``/``zero_point`` leaves stay resident for the
    prefill/fused variant but are never read per decode token — counting
    them overstated effective bandwidth by ~20% at g=32."""
    import jax

    from torchao_tpu.qtypes.base import QuantizedArray

    def leaf_bytes(leaf) -> int:
        if isinstance(leaf, QuantizedArray):
            if not hasattr(leaf, "qdata"):
                # wrapper arrays (int8dq's LinearActivationQuantized,
                # fp6's Fp6Dual): sum their inner quantized planes
                inner = [
                    v for v in vars(leaf).values()
                    if isinstance(v, QuantizedArray)
                ]
                if inner:
                    return sum(leaf_bytes(v) for v in inner)
                return 0
            eff = getattr(leaf, "qparams_eff", None)
            reads = [leaf.qdata]
            if eff is not None:
                reads += [eff]
            else:
                reads += [
                    a for a in (leaf.scale, getattr(leaf, "zero_point", None))
                    if a is not None
                ]
            return sum(a.size * a.dtype.itemsize for a in reads)
        if hasattr(leaf, "dtype"):
            return leaf.size * leaf.dtype.itemsize
        return 0

    total = 0
    for section in ("layers", "output", "norm"):
        if section in params:
            total += sum(
                leaf_bytes(l)
                for l in jax.tree_util.tree_leaves(
                    params[section],
                    is_leaf=lambda x: isinstance(x, QuantizedArray),
                )
            )
    return total


# The decode launch structure's measured streaming ceiling: the stub arm
# of scripts/ceiling_probe_r4.py (identical launches/blocks/bytes, dequant
# stubbed to one raw-byte MXU pass) reads 644 GB/s on this platform; the
# real kernel reads 621.5 (96.5% of structure ceiling). Re-run the probe
# when the launch structure changes.
STRUCTURE_CEILING_GBPS = 644.0


def _peak_memory_gb():
    """Device peak memory (reference rows report peak_mem). The axon
    tunnel returns no allocator stats, so fall back to accounting the
    live device arrays (params + caches — activation scratch excluded);
    the method is reported alongside the number."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get(
            "bytes_in_use"
        )
        if peak:
            return round(peak / 1e9, 3), "allocator_stats"
    except Exception:
        pass
    try:
        total = sum(
            a.size * a.dtype.itemsize
            for a in jax.live_arrays()
            if getattr(a, "is_deleted", lambda: False)() is False
        )
        return round(total / 1e9, 3), "live_arrays_accounting"
    except Exception:
        return None, "unavailable"


def main():
    from torchao_tpu.models.llama.generate import benchmark_decode
    from torchao_tpu.models.llama.model import (
        ModelArgs,
        Transformer,
        default_linear_filter,
    )
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    small = os.environ.get("BENCH_SMALL") == "1"
    name = os.environ.get("BENCH_MODEL", "Llama-3-8B")
    num_tokens = int(os.environ.get("BENCH_NUM_TOKENS", "128"))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "128"))
    # int4-quantized KV cache ON by default: the headline config now
    # literally matches BASELINE config #3 ("int4wo g=32 + int4
    # quantized KV-cache"). A/B at prompt 128: 124.97 tok/s with
    # int4_smajor KV vs 125.54 without (a no-op at short ctx; the
    # packed-int4 split-flat cache wins at 8k — benchmark_results.txt).
    # BENCH_KV_QUANT=none opts out; "int8_smajor"/"int8"/"int4" select.
    kv_quant = os.environ.get("BENCH_KV_QUANT", "int4_smajor")
    if kv_quant in ("none", "0", "false", ""):
        kv_quant = False
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    if small:
        args = ModelArgs(
            block_size=512, vocab_size=512, n_layer=2, n_head=8,
            n_local_heads=8, dim=256, intermediate_size=512,
        )
        model = Transformer(args, dtype=jnp.bfloat16)
        name = "tiny"
    else:
        args = ModelArgs.from_name(name)
        # cap the RoPE/cache table, but never below what the requested
        # prompt + new tokens need (long-context runs)
        need = prompt_len + num_tokens
        args.block_size = min(args.block_size, max(4096, need))
        model = Transformer(args, dtype=jnp.bfloat16)

    config = Int4WeightOnlyConfig(group_size=32)
    t0 = time.time()
    params = init_quantized_llama(
        model, config, default_linear_filter, jax.random.PRNGKey(0)
    )
    init_s = time.time() - t0

    pallas_fallback = False
    try:
        res = benchmark_decode(
            model, params,
            batch_size=batch, prompt_len=prompt_len, num_tokens=num_tokens,
            kv_cache_quantization=kv_quant,
        )
    except Exception as e:
        # Mosaic/driver variance must never zero the headline: retry the
        # same benchmark through the pure-XLA paths.
        sys.stderr.write(f"Pallas path failed ({e}); XLA fallback\n")
        os.environ["TORCHAO_TPU_DISABLE_PALLAS_INT4"] = "1"
        os.environ["TORCHAO_TPU_DISABLE_PALLAS_ATTN"] = "1"
        pallas_fallback = True
        res = benchmark_decode(
            model, params,
            batch_size=batch, prompt_len=prompt_len, num_tokens=num_tokens,
            kv_cache_quantization=kv_quant,
        )
    value = res["tokens_per_s"]

    # bandwidth accounting: this platform is a virtualized v5e slice whose
    # effective HBM bandwidth is far below a full chip's 819 GB/s (simple
    # probes read ~75-110 GB/s; pipelined decode achieves more). Report
    # the decode's effective weight-streaming bandwidth next to the probe
    # so design quality is visible independent of the platform cap.
    device_bw = measure_device_bandwidth_gbps()
    read_bytes = weight_read_bytes_per_token(params)
    eff_bw = value / batch * read_bytes / 1e9
    peak_gb, peak_method = _peak_memory_gb()
    print(
        json.dumps(
            {
                "metric": f"{name}_int4wo-g32_decode_tok_s_per_chip",
                "value": round(value, 2),
                "unit": "tok/s",
                "vs_baseline": round(value / BASELINE_TOK_S, 4),
                "ttft_p50_ms": round(res.get("ttft_p50_ms", 0.0), 1),
                "effective_weight_bw_GBps": round(eff_bw, 1),
                # the ceiling probe measured the Llama-3-8B launch
                # structure; the fraction is only meaningful there
                **(
                    {
                        "structure_ceiling_GBps": STRUCTURE_CEILING_GBPS,
                        "pct_of_structure_ceiling": round(
                            100 * eff_bw / STRUCTURE_CEILING_GBPS, 1
                        ),
                    }
                    if name == "Llama-3-8B" else {}
                ),
                "probe_bw_GBps": round(device_bw, 1),
                "weight_read_GB_per_tok": round(read_bytes / 1e9, 3),
                "model_size_GB": round(res["model_size_GB"], 3),
                "init_s": round(init_s, 1),
                "backend": jax.default_backend(),
                "pallas_fallback": pallas_fallback,
                "peak_mem_GB": peak_gb,
                "peak_mem_method": peak_method,
            }
        )
    )


if __name__ == "__main__":
    main()
