"""SAM2-style video segmentation model (compact, quantization-ready).

Covers the reference's ``torchao/_models/sam2`` (7.9k-LoC full port) at
the architecture-essence level: the pieces whose linears dominate compute
and that the reference's quantization benchmarks exercise —

- image encoder: the ViT from ``models/sam.py`` (per-frame features)
- memory attention: current-frame tokens cross-attend to a rolling
  memory bank of (past feature, past mask-embedding) tokens
- memory encoder: fuses predicted masks into memory tokens
- mask decoder: a two-way transformer (object queries ↔ image tokens)
  producing mask logits + IoU scores
- ``propagate_in_video``: per-frame loop maintaining the memory bank
  (``lax``-free host loop — frame count is a host-side quantity)

All matmuls route through ``ops.linear`` so every quantization config,
sparsity mask and QAT wrapper composes; weights use stacked-block layouts
like the other models. Checkpoint-level compatibility with the original
SAM2 weights is out of scope (the reference's CUDA connected-components
postprocessing is a documented non-goal, SURVEY.md §2.7).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.models.llama.model import _layer_weight
from torchao_tpu.models.sam import SamImageEncoder, ViTArgs, layer_norm, vit_configs


@dataclasses.dataclass
class SAM2Args:
    encoder: str = "vit_tiny_debug"
    mem_dim: int = 64
    num_mem_layers: int = 2
    num_dec_layers: int = 2
    num_heads: int = 4
    num_mask_tokens: int = 4
    memory_size: int = 7  # frames kept in the bank (SAM2 default)


def _cross_attn(q_tokens, kv_tokens, lw, num_heads, eps=1e-6):
    """One cross-attention + MLP block over token sets."""
    B, Nq, D = q_tokens.shape
    Dh = D // num_heads
    h = layer_norm(q_tokens, lw["norm1"]["weight"], lw["norm1"]["bias"], eps)
    q = ops.linear(h, _layer_weight(lw["wq"]))
    k = ops.linear(kv_tokens, _layer_weight(lw["wk"]))
    v = ops.linear(kv_tokens, _layer_weight(lw["wv"]))
    q = q.reshape(B, Nq, num_heads, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, num_heads, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, num_heads, Dh).transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(Dh)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, Nq, D)
    x = q_tokens + ops.linear(o, _layer_weight(lw["wo"]))
    h = layer_norm(x, lw["norm2"]["weight"], lw["norm2"]["bias"], eps)
    h = jax.nn.gelu(ops.linear(h, _layer_weight(lw["fc1"])))
    return x + ops.linear(h, _layer_weight(lw["fc2"]))


class SAM2VideoPredictor:
    def __init__(self, args: SAM2Args, dtype=jnp.bfloat16):
        self.args = args
        self.encoder = SamImageEncoder.from_name(args.encoder, dtype)
        self.dtype = dtype
        self.D = self.encoder.args.out_chans

    def init_params(self, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        a, D = self.args, self.D
        H = a.num_heads
        ks = iter(jax.random.split(key, 64))

        def init(shape, fan_in):
            return (
                jax.random.normal(next(ks), shape, jnp.float32)
                / math.sqrt(fan_in)
            ).astype(self.dtype)

        def block(L):
            return {
                "wq": init((L, D, D), D), "wk": init((L, D, D), D),
                "wv": init((L, D, D), D), "wo": init((L, D, D), D),
                "fc1": init((L, 4 * D, D), D),
                "fc2": init((L, D, 4 * D), 4 * D),
                "norm1": {
                    "weight": jnp.ones((L, D), self.dtype),
                    "bias": jnp.zeros((L, D), self.dtype),
                },
                "norm2": {
                    "weight": jnp.ones((L, D), self.dtype),
                    "bias": jnp.zeros((L, D), self.dtype),
                },
            }

        return {
            "image_encoder": self.encoder.init_params(next(ks)),
            "memory_attention": block(a.num_mem_layers),
            "mask_decoder": block(a.num_dec_layers),
            "mask_tokens": init((a.num_mask_tokens, D), D),
            "memory_proj": {"weight": init((D, D), D)},
            "mask_embed": {"weight": init((D, 1), 1)},
            "iou_head": {"weight": init((1, D), D)},
            "mask_head": {"weight": init((D, D), D)},
        }

    # ------------------------------------------------------------------
    def encode_frame(self, params, frame):
        """frame [B, H, W, 3] → tokens [B, N, D]."""
        return self.encoder(params["image_encoder"], frame)

    def _condition_on_memory(self, params, tokens, memory):
        if memory is None:
            return tokens
        a = self.args
        x, _ = jax.lax.scan(
            lambda x, lw: (_cross_attn(x, memory, lw, a.num_heads), None),
            tokens, params["memory_attention"],
        )
        return x

    def decode_masks(self, params, tokens):
        """tokens [B, N, D] → (mask_logits [B, num_mask_tokens, N],
        iou [B, num_mask_tokens])."""
        B = tokens.shape[0]
        a = self.args
        queries = jnp.broadcast_to(
            params["mask_tokens"][None], (B,) + params["mask_tokens"].shape
        )

        q, _ = jax.lax.scan(
            lambda q, lw: (
                _cross_attn(q, tokens, lw, a.num_heads), None
            ),
            queries, params["mask_decoder"],
        )
        mask_emb = ops.linear(q, _layer_weight(params["mask_head"]["weight"]))
        masks = jnp.einsum("bmd,bnd->bmn", mask_emb, tokens)
        iou = ops.linear(q, params["iou_head"]["weight"])[..., 0]
        return masks, iou

    def _to_memory(self, params, tokens, mask_logits):
        """Fuse the best mask into memory tokens (memory encoder)."""
        prob = jax.nn.sigmoid(
            mask_logits.astype(jnp.float32).max(axis=1)
        )[..., None].astype(tokens.dtype)  # [B, N, 1]
        fused = tokens + ops.linear(prob, params["mask_embed"]["weight"])
        return ops.linear(fused, params["memory_proj"]["weight"])

    def _frame_step(self):
        """One jitted per-frame step (encode → memory cross-attention →
        decode → memory encode). Cached so the host frame loop runs
        ≤ memory_size+1 compiled programs (one per bank length) instead
        of eager op-by-op — required on the remote TPU backend where
        eager dispatch pays a network round trip per op."""
        if not hasattr(self, "_frame_step_fn"):
            @jax.jit
            def step(params, frame, memory):
                tokens = self.encode_frame(params, frame)
                cond = (
                    tokens if memory is None
                    else self._condition_on_memory(params, tokens, memory)
                )
                masks, iou = self.decode_masks(params, cond)
                mem = self._to_memory(params, cond, masks)
                return masks, iou, mem

            self._frame_step_fn = step
        return self._frame_step_fn

    def propagate_in_video(
        self, params, frames: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frames [T, B, H, W, 3] → (masks [T, B, M, N], ious [T, B, M]),
        with a rolling ``memory_size``-frame bank (host loop over frames,
        one jitted program per bank length)."""
        step = self._frame_step()
        memory: Optional[jnp.ndarray] = None
        bank: List[jnp.ndarray] = []
        masks_out, ious_out = [], []
        for t in range(frames.shape[0]):
            masks, iou, mem = step(params, frames[t], memory)
            masks_out.append(masks)
            ious_out.append(iou)
            bank.append(mem)
            bank = bank[-self.args.memory_size:]
            memory = jnp.concatenate(bank, axis=1)
        return jnp.stack(masks_out), jnp.stack(ious_out)


def sam2_linear_filter(path: str, leaf) -> bool:
    names = ("wq", "wk", "wv", "wo", "fc1", "fc2", "qkv", "proj",
             "mask_head", "memory_proj")
    return (
        hasattr(leaf, "ndim") and leaf.ndim in (2, 3)
        and any(f".{n}" in f".{path}" or path.endswith(n) for n in names)
        and "norm" not in path
    )
