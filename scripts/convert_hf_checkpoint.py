"""Convert a HuggingFace Llama checkpoint to the torchao_tpu stacked pytree.

Equivalent of the reference's ``scripts/convert_hf_checkpoint.py`` (name
mapping + the rotary permutation gpt-fast applies to wq/wk, since HF uses
half-split rotary while this model — like gpt-fast — pairs adjacent
features).

Usage:
  python scripts/convert_hf_checkpoint.py --checkpoint_dir <hf_dir> \
      --out <out.npz> [--model_name Llama-3-8B]

Reads ``*.safetensors`` (preferred) or ``pytorch_model*.bin`` shards with
CPU torch; writes a ``.npz`` of numpy arrays with flat dotted keys that
``load_checkpoint`` reassembles into the stacked-layer params pytree.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from typing import Dict

import numpy as np


def _hf_state_dict(checkpoint_dir: str) -> Dict[str, "np.ndarray"]:
    import torch

    state = {}
    st_files = sorted(glob.glob(os.path.join(checkpoint_dir, "*.safetensors")))
    if st_files:
        from safetensors.torch import load_file

        for f in st_files:
            state.update(load_file(f, device="cpu"))
    else:
        for f in sorted(
            glob.glob(os.path.join(checkpoint_dir, "pytorch_model*.bin"))
        ):
            state.update(torch.load(f, map_location="cpu", weights_only=True))
    return {
        k: v.to(torch.float32).numpy() for k, v in state.items()
    }


def _permute_rotary(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """HF half-split rotary → adjacent-pair rotary (gpt-fast permute)."""
    out_dim, in_dim = w.shape
    w = w.reshape(n_head, 2, head_dim // 2, in_dim)
    w = w.transpose(0, 2, 1, 3)
    return w.reshape(out_dim, in_dim)


def convert(checkpoint_dir: str, model_name: str) -> Dict[str, np.ndarray]:
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from torchao_tpu.models.llama.model import ModelArgs

    args = ModelArgs.from_name(model_name)
    hf = _hf_state_dict(checkpoint_dir)
    L = args.n_layer
    Dh = args.head_dim

    out: Dict[str, np.ndarray] = {}
    out["tok_embeddings.weight"] = hf["model.embed_tokens.weight"]
    out["norm.weight"] = hf["model.norm.weight"]
    if not args.tie_word_embeddings:
        out["output.weight"] = hf["lm_head.weight"]

    def stack(fmt, permute_heads=None):
        ws = []
        for i in range(L):
            w = hf[fmt.format(i)]
            if permute_heads is not None:
                w = _permute_rotary(w, permute_heads, Dh)
            ws.append(w)
        return np.stack(ws)

    wq = stack("model.layers.{}.self_attn.q_proj.weight", args.n_head)
    wk = stack("model.layers.{}.self_attn.k_proj.weight", args.n_local_heads)
    wv = stack("model.layers.{}.self_attn.v_proj.weight")
    out["layers.attention.wqkv"] = np.concatenate([wq, wk, wv], axis=1)
    out["layers.attention.wo"] = stack(
        "model.layers.{}.self_attn.o_proj.weight"
    )
    out["layers.feed_forward.w13"] = np.concatenate(
        [
            stack("model.layers.{}.mlp.gate_proj.weight"),
            stack("model.layers.{}.mlp.up_proj.weight"),
        ],
        axis=1,
    )
    out["layers.feed_forward.w2"] = stack(
        "model.layers.{}.mlp.down_proj.weight"
    )
    out["layers.attention_norm.weight"] = stack(
        "model.layers.{}.input_layernorm.weight"
    )
    out["layers.ffn_norm.weight"] = stack(
        "model.layers.{}.post_attention_layernorm.weight"
    )
    return out


def load_checkpoint(path: str, dtype="bfloat16"):
    """Load a converted .npz into the nested params pytree (jnp arrays)."""
    import jax.numpy as jnp

    flat = np.load(path)
    params: Dict = {}
    for key in flat.files:
        node = params
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key], jnp.dtype(dtype))
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model_name", default=None)
    a = ap.parse_args()
    name = a.model_name or os.path.basename(a.checkpoint_dir.rstrip("/"))
    arrays = convert(a.checkpoint_dir, name)
    np.savez(a.out, **arrays)
    total = sum(v.nbytes for v in arrays.values())
    print(f"wrote {a.out}: {len(arrays)} tensors, {total/1e9:.2f} GB (fp32)")


if __name__ == "__main__":
    main()
