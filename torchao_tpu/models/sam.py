"""SAM-style ViT image encoder for quantization/sparsity benchmarking.

Equivalent of the reference's ``torchao/_models/sam`` pipeline: the SAM
benchmark numbers (SURVEY.md §6, ``sparsity/README.md:21-29``) are set by
the **ViT-H image encoder** (windowless global-attention blocks dominate),
so this module implements that encoder functionally (patch embed →
transformer blocks with optional rel-pos-free attention → neck) with the
same ``quantize_``/``sparsify_`` composition and an img/s benchmark.

Weights are stacked over blocks and run under ``lax.scan`` like the Llama
decoder; ``ops.linear`` dispatch gives every quantized path.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.models.llama.model import _layer_weight


@dataclasses.dataclass
class ViTArgs:
    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1280      # ViT-H
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    layer_norm_eps: float = 1e-6


vit_configs = {
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_tiny_debug": dict(
        img_size=64, embed_dim=128, depth=2, num_heads=4, out_chans=32
    ),
}


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _block(x, lw, args: ViTArgs):
    """Pre-LN ViT block: MHA + MLP, both through quantized dispatch."""
    B, N, D = x.shape
    H = args.num_heads
    Dh = D // H

    h = layer_norm(
        x, lw["norm1"]["weight"], lw["norm1"]["bias"], args.layer_norm_eps
    )
    qkv = ops.linear(h, _layer_weight(lw["attn"]["qkv"]))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(Dh)
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    x = x + ops.linear(o, _layer_weight(lw["attn"]["proj"]))

    h = layer_norm(
        x, lw["norm2"]["weight"], lw["norm2"]["bias"], args.layer_norm_eps
    )
    h = ops.linear(h, _layer_weight(lw["mlp"]["fc1"]))
    h = jax.nn.gelu(h)
    x = x + ops.linear(h, _layer_weight(lw["mlp"]["fc2"]))
    return x


def image_encoder_forward(params, images, args: ViTArgs):
    """images [B, H, W, C] → embeddings [B, N_patches, out_chans]."""
    B = images.shape[0]
    P = args.patch_size
    # patch embed as a linear over flattened patches
    x = images.reshape(
        B, args.img_size // P, P, args.img_size // P, P, args.in_chans
    ).transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (args.img_size // P) ** 2, P * P * args.in_chans
    )
    x = ops.linear(x, params["patch_embed"]["weight"])
    x = x + params["pos_embed"]

    def body(x, lw):
        return _block(x, lw, args), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = ops.linear(x, params["neck"]["weight"])
    return x


class SamImageEncoder:
    def __init__(self, args: ViTArgs, dtype=jnp.bfloat16):
        self.args = args
        self.dtype = dtype

    @classmethod
    def from_name(cls, name: str, dtype=jnp.bfloat16):
        return cls(ViTArgs(**vit_configs[name]), dtype)

    def init_params(self, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        a = self.args
        D, L = a.embed_dim, a.depth
        I = int(D * a.mlp_ratio)
        N = (a.img_size // a.patch_size) ** 2
        pdim = a.patch_size * a.patch_size * a.in_chans
        ks = jax.random.split(key, 8)

        def init(k, shape, fan_in):
            return (
                jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)
            ).astype(self.dtype)

        return {
            "patch_embed": {"weight": init(ks[0], (D, pdim), pdim)},
            "pos_embed": jnp.zeros((1, N, D), self.dtype),
            "blocks": {
                "attn": {
                    "qkv": init(ks[1], (L, 3 * D, D), D),
                    "proj": init(ks[2], (L, D, D), D),
                },
                "mlp": {
                    "fc1": init(ks[3], (L, I, D), D),
                    "fc2": init(ks[4], (L, D, I), I),
                },
                "norm1": {
                    "weight": jnp.ones((L, D), self.dtype),
                    "bias": jnp.zeros((L, D), self.dtype),
                },
                "norm2": {
                    "weight": jnp.ones((L, D), self.dtype),
                    "bias": jnp.zeros((L, D), self.dtype),
                },
            },
            "neck": {"weight": init(ks[5], (a.out_chans, D), D)},
        }

    def __call__(self, params, images):
        return image_encoder_forward(params, images, self.args)


def sam_linear_filter(path: str, leaf) -> bool:
    """Quantize attention+MLP linears (the reference's SAM recipe targets
    attn/mlp; norms/pos-embed/patch-embed stay hp)."""
    names = ("qkv", "proj", "fc1", "fc2")
    return (
        hasattr(leaf, "ndim") and leaf.ndim in (2, 3)
        and any(f".{n}" in f".{path}" or path.endswith(n) for n in names)
    )


def benchmark_images_per_s(
    model: SamImageEncoder, params, batch_size=8, iters=3
) -> float:
    x = jnp.zeros(
        (batch_size, model.args.img_size, model.args.img_size, 3),
        model.dtype,
    )
    f = jax.jit(lambda p, x: model(p, x))
    float(jnp.ravel(f(params, x))[0])  # compile + sync by fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, x)
    float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return batch_size / dt
