"""Perplexity evaluation harness.

Equivalent of the reference's ``torchao/_models/llama/eval.py`` +
``TransformerEvalWrapper`` (``_models/_eval.py:29``): sliding-window ppl
over a token stream. The wikitext dataset itself must be provided as a
token file (this environment has no network egress); any int32 token array
works — ``evaluate_ppl`` is dataset-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.model import Transformer


def evaluate_ppl(
    model: Transformer,
    params: Dict[str, Any],
    tokens: np.ndarray,      # [T] int32 token stream
    *,
    seq_len: int = 2048,
    stride: Optional[int] = None,
    max_windows: Optional[int] = None,
) -> float:
    """Perplexity = exp(mean NLL of next-token predictions), computed over
    non-overlapping windows by default (the lm-eval convention for
    wikitext word-level ppl matches the reference's usage)."""
    if stride is None:
        stride = seq_len
    tokens = np.asarray(tokens, np.int32)
    n = (len(tokens) - 1) // stride
    if max_windows is not None:
        n = min(n, max_windows)
    assert n > 0, "token stream too short"

    @jax.jit
    def window_nll(p, toks):
        logits, _ = model(p, toks[None, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = toks[None, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return jnp.sum(nll), nll.size

    total, count = 0.0, 0
    for i in range(n):
        chunk = tokens[i * stride : i * stride + seq_len + 1]
        if len(chunk) < seq_len + 1:
            break
        s, c = window_nll(params, jnp.asarray(chunk))
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def main(argv=None):
    """Turn-key eval CLI (reference ``_models/llama/eval.py`` surface):

        python -m torchao_tpu.models.llama.eval \
            --checkpoint ckpt.npz --tokens wikitext_test.npy \
            -q int4wo-32 [--seq-len 2048] [--limit N]

    ``--tokens`` is any int32 token stream (.npy). Drop in a wikitext
    token file + an HF-converted checkpoint
    (scripts/convert_hf_checkpoint.py) to produce the BASELINE wikitext
    ppl rows; with ``--fake-weights`` the full plumbing runs on random
    weights (the zero-egress dry run — the ppl is meaningless but every
    code path is the real one)."""
    import argparse
    import json
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="Llama-3-8B")
    ap.add_argument("--checkpoint", default=None,
                    help=".npz from scripts/convert_hf_checkpoint.py")
    ap.add_argument("--tokens", required=True,
                    help=".npy int32 token stream (e.g. tokenized "
                    "wikitext-2 test split)")
    ap.add_argument("-q", "--quantization", default=None)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--limit", type=int, default=None,
                    help="max eval windows")
    ap.add_argument("--fake-weights", action="store_true",
                    help="random init instead of a checkpoint (plumbing "
                    "dry run)")
    args = ap.parse_args(argv)

    from torchao_tpu.models.llama.cli import config_from_recipe
    from torchao_tpu.models.llama.model import (
        ModelArgs,
        default_linear_filter,
    )
    from torchao_tpu.quantization.quant_api import quantize_

    margs = ModelArgs.from_name(args.model_name)
    margs.block_size = min(margs.block_size, max(args.seq_len, 64))
    model = Transformer(margs, dtype=jnp.bfloat16)

    if args.checkpoint:
        from scripts.convert_hf_checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint)
    elif args.fake_weights:
        if args.quantization and not args.quantization.startswith(
            ("autoquant", "spinquant", "awq", "embed")
        ):
            cfg = config_from_recipe(args.quantization)
            if not isinstance(cfg, tuple):
                from torchao_tpu.models.llama.init_utils import (
                    init_quantized_params,
                )

                params = init_quantized_params(
                    model, cfg, default_linear_filter,
                    jax.random.PRNGKey(0),
                )
                args.quantization = None  # already applied
            else:
                params = model.init_params(jax.random.PRNGKey(0))
        else:
            params = model.init_params(jax.random.PRNGKey(0))
    else:
        raise SystemExit("need --checkpoint or --fake-weights")

    if args.quantization:
        cfg = config_from_recipe(args.quantization)
        if isinstance(cfg, tuple):
            raise SystemExit(
                f"recipe {args.quantization!r} needs the generate CLI "
                "(calibration flows); eval supports plain PTQ configs"
            )
        params = quantize_(params, cfg, filter_fn=default_linear_filter)
        from torchao_tpu.models.llama.init_utils import (
            untie_quantized_head,
        )

        params = untie_quantized_head(params, margs, cfg)

    tokens = np.load(args.tokens)
    t0 = time.time()
    ppl = evaluate_ppl(
        model, params, tokens, seq_len=args.seq_len,
        max_windows=args.limit,
    )
    print(json.dumps({
        "model": args.model_name,
        "quantization": args.quantization,
        "seq_len": args.seq_len,
        "tokens": int(len(tokens)),
        "wikitext_ppl": round(ppl, 4),
        "eval_s": round(time.time() - t0, 1),
        "fake_weights": bool(args.fake_weights),
    }))
    return ppl


if __name__ == "__main__":
    main()
