"""SAM2 checkpoint converter: reference state-dict → TPU params pytree.

Maps the reference SAM2 checkpoint naming (``SAM2Base`` state_dict —
``torchao/_models/sam2/modeling/sam2_base.py``: ``image_encoder.trunk.*``
Hiera, ``image_encoder.neck.*`` FPN, ``sam_prompt_encoder.*``,
``sam_mask_decoder.*``, ``memory_encoder.*``, ``memory_attention.*`` plus
the top-level parameters ``maskmem_tpos_enc`` / ``no_mem_embed`` /
``no_mem_pos_enc`` / ``no_obj_ptr`` / ``no_obj_embed_spatial`` /
``obj_ptr_proj`` / ``obj_ptr_tpos_proj`` / ``mask_downsample``) onto the
:mod:`torchao_tpu.models.sam2_modeling` parameter pytree.

Layout conventions translated here:
- torch ``nn.Linear`` weight is [out, in] — ours too (direct copy);
- torch ``nn.Conv2d`` weight is OIHW — ours is HWIO (``transpose``);
- torch ``nn.ConvTranspose2d`` weight is IOHW — ours is HWIO with
  ``jax.lax.conv_transpose(transpose_kernel=False)`` semantics:
  ``transpose(2, 3, 0, 1)`` plus a spatial tap flip (the JAX op
  correlates where torch convolves — verified bit-level in
  ``tests/test_sam2_convert.py``);
- depthwise conv weight [C, 1, kh, kw] → [kh, kw, 1, C];
- ``PositionEmbeddingRandom``'s gaussian matrix is [2, F] — ours is its
  transpose ([F, 2], ``random_fourier_pe`` right-multiplies by the
  transpose);
- ``nn.Embedding`` rows ([1, D]) become flat vectors where our model
  stores vectors.

Use :func:`convert_sam2_checkpoint` with a ``{name: numpy array}`` dict
(call ``.numpy()`` on torch tensors first, or pass tensors — they are
coerced via ``np.asarray``). Returns ``(params, unconsumed_keys)``;
an empty ``unconsumed_keys`` list means full checkpoint coverage.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from torchao_tpu.models.sam2_modeling import SAM2Config, StaticInt


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class _SD:
    """State-dict view that records consumed keys."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def unconsumed(self) -> List[str]:
        return sorted(set(self.sd) - self.used)


def _lin(sd: _SD, prefix: str) -> Dict[str, Any]:
    lw = {"weight": jnp.asarray(sd.take(prefix + ".weight"))}
    lw["bias"] = (
        jnp.asarray(sd.take(prefix + ".bias"))
        if sd.has(prefix + ".bias") else None
    )
    return lw


def _ln(sd: _SD, prefix: str) -> Dict[str, Any]:
    return {
        "weight": jnp.asarray(sd.take(prefix + ".weight")),
        "bias": jnp.asarray(sd.take(prefix + ".bias")),
    }


def _conv(sd: _SD, prefix: str) -> Dict[str, Any]:
    w = sd.take(prefix + ".weight")  # OIHW
    out = {"weight": jnp.asarray(w.transpose(2, 3, 1, 0))}  # HWIO
    out["bias"] = (
        jnp.asarray(sd.take(prefix + ".bias"))
        if sd.has(prefix + ".bias") else None
    )
    return out


def _conv_t(sd: _SD, prefix: str) -> Dict[str, Any]:
    w = sd.take(prefix + ".weight")  # IOHW (ConvTranspose2d)
    # jax.lax.conv_transpose with transpose_kernel=False correlates a
    # [kh, kw, in, out] kernel; torch's transposed conv convolves, so
    # flip the spatial taps (verified exact in tests/test_sam2_convert)
    return {
        "weight": jnp.asarray(
            w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        ),
        "bias": jnp.asarray(sd.take(prefix + ".bias")),
    }


def _dwconv(sd: _SD, prefix: str) -> Dict[str, Any]:
    w = sd.take(prefix + ".weight")  # [C, 1, kh, kw]
    return {
        "weight": jnp.asarray(w.transpose(2, 3, 1, 0)),  # [kh, kw, 1, C]
        "bias": jnp.asarray(sd.take(prefix + ".bias")),
    }


def _attn(sd: _SD, prefix: str, heads: int) -> Dict[str, Any]:
    """Reference ``Attention``/``RoPEAttention`` (transformer.py:219)."""
    return {
        "wq": _lin(sd, prefix + ".q_proj"),
        "wk": _lin(sd, prefix + ".k_proj"),
        "wv": _lin(sd, prefix + ".v_proj"),
        "wo": _lin(sd, prefix + ".out_proj"),
        "heads": StaticInt(heads),
    }


def _mlp(sd: _SD, prefix: str, n_layers: int) -> List[Dict[str, Any]]:
    """Reference ``MLP`` (sam2_utils.py:112): ``layers.{i}`` linears."""
    return [_lin(sd, f"{prefix}.layers.{i}") for i in range(n_layers)]


# ---------------------------------------------------------------------------
# per-module converters
# ---------------------------------------------------------------------------


def convert_hiera(sd: _SD, prefix: str = "image_encoder.trunk.") -> Dict:
    p: Dict[str, Any] = {
        # [1, C, H, W] → [H, W, C]
        "pos_embed": jnp.asarray(
            sd.take(prefix + "pos_embed")[0].transpose(1, 2, 0)
        ),
        "pos_embed_window": jnp.asarray(
            sd.take(prefix + "pos_embed_window")[0].transpose(1, 2, 0)
        ),
        "patch_embed": _conv(sd, prefix + "patch_embed.proj"),
        "blocks": [],
    }
    i = 0
    while sd.has(f"{prefix}blocks.{i}.norm1.weight"):
        bp = f"{prefix}blocks.{i}"
        blk = {
            "norm1": _ln(sd, bp + ".norm1"),
            "qkv": _lin(sd, bp + ".attn.qkv"),
            "proj_attn": _lin(sd, bp + ".attn.proj"),
            "norm2": _ln(sd, bp + ".norm2"),
            "mlp": _mlp(sd, bp + ".mlp", 2),
        }
        if sd.has(bp + ".proj.weight"):
            blk["proj"] = _lin(sd, bp + ".proj")
        p["blocks"].append(blk)
        i += 1
    return p


def convert_fpn_neck(sd: _SD, prefix: str = "image_encoder.neck.") -> Dict:
    # reference convs iterate backbone_channel_list LOW-res first; ours
    # are stored per-feature HIGH-res first (sam2_modeling.init_fpn_neck)
    n = 0
    while sd.has(f"{prefix}convs.{n}.conv.weight"):
        n += 1
    return {
        "convs": [
            _conv(sd, f"{prefix}convs.{n - 1 - i}.conv") for i in range(n)
        ]
    }


def convert_prompt_encoder(sd: _SD, prefix: str = "sam_prompt_encoder.") -> Dict:
    return {
        # [2, F] → [F, 2] (random_fourier_pe right-multiplies by m.T)
        "pe_gauss": jnp.asarray(
            sd.take(
                prefix + "pe_layer.positional_encoding_gaussian_matrix"
            ).T
        ),
        "point_embeddings": jnp.asarray(np.concatenate(
            [
                sd.take(f"{prefix}point_embeddings.{j}.weight")
                for j in range(4)
            ],
            axis=0,
        )),
        "not_a_point": jnp.asarray(
            sd.take(prefix + "not_a_point_embed.weight")[0]
        ),
        "no_mask": jnp.asarray(
            sd.take(prefix + "no_mask_embed.weight")[0]
        ),
        # Sequential(conv, LayerNorm2d, GELU, conv, LayerNorm2d, GELU,
        # conv) → indices 0, 1, 3, 4, 6 (prompt_encoder.py:56-64)
        "mask_down": [
            _conv(sd, prefix + "mask_downscaling.0"),
            _conv(sd, prefix + "mask_downscaling.3"),
            _conv(sd, prefix + "mask_downscaling.6"),
        ],
        "mask_ln": [
            _ln(sd, prefix + "mask_downscaling.1"),
            _ln(sd, prefix + "mask_downscaling.4"),
        ],
    }


def convert_two_way_transformer(sd: _SD, prefix: str, heads: int) -> Dict:
    layers = []
    i = 0
    while sd.has(f"{prefix}layers.{i}.norm1.weight"):
        lp = f"{prefix}layers.{i}"
        layers.append({
            "self_attn": _attn(sd, lp + ".self_attn", heads),
            "norm1": _ln(sd, lp + ".norm1"),
            "t2i": _attn(sd, lp + ".cross_attn_token_to_image", heads),
            "norm2": _ln(sd, lp + ".norm2"),
            "mlp": _mlp(sd, lp + ".mlp", 2),
            "norm3": _ln(sd, lp + ".norm3"),
            "i2t": _attn(sd, lp + ".cross_attn_image_to_token", heads),
            "norm4": _ln(sd, lp + ".norm4"),
        })
        i += 1
    return {
        "layers": layers,
        "final_t2i": _attn(
            sd, prefix + "final_attn_token_to_image", heads
        ),
        "norm_final": _ln(sd, prefix + "norm_final_attn"),
    }


def convert_mask_decoder(
    sd: _SD, prefix: str = "sam_mask_decoder.", heads: int = 8
) -> Dict:
    n_mask = sd.take(prefix + "mask_tokens.weight").shape[0]
    sd.used.discard(prefix + "mask_tokens.weight")  # re-taken below
    p: Dict[str, Any] = {
        "transformer": convert_two_way_transformer(
            sd, prefix + "transformer.", heads
        ),
        "iou_token": jnp.asarray(sd.take(prefix + "iou_token.weight")),
        "mask_tokens": jnp.asarray(
            sd.take(prefix + "mask_tokens.weight")
        ),
        # output_upscaling = Sequential(ConvT, LayerNorm2d, act, ConvT,
        # act) → indices 0, 1, 3 (mask_decoder.py:65-75)
        "upscale1": _conv_t(sd, prefix + "output_upscaling.0"),
        "upscale_ln": _ln(sd, prefix + "output_upscaling.1"),
        "upscale2": _conv_t(sd, prefix + "output_upscaling.3"),
        "hyper_mlps": [
            _mlp(sd, f"{prefix}output_hypernetworks_mlps.{m}", 3)
            for m in range(n_mask)
        ],
        "iou_head": _mlp(sd, prefix + "iou_prediction_head", 3),
    }
    if sd.has(prefix + "obj_score_token.weight"):
        p["obj_score_token"] = jnp.asarray(
            sd.take(prefix + "obj_score_token.weight")
        )
        if sd.has(prefix + "pred_obj_score_head.layers.0.weight"):
            p["obj_score_head"] = _mlp(
                sd, prefix + "pred_obj_score_head", 3
            )
        else:  # pred_obj_scores_mlp=False → single Linear
            p["obj_score_head"] = [
                _lin(sd, prefix + "pred_obj_score_head")
            ]
    if sd.has(prefix + "conv_s0.weight"):
        p["conv_s0"] = _conv(sd, prefix + "conv_s0")
        p["conv_s1"] = _conv(sd, prefix + "conv_s1")
    return p


def convert_memory_encoder(sd: _SD, prefix: str = "memory_encoder.") -> Dict:
    # MaskDownSampler stages are Sequential triples (conv, LayerNorm2d,
    # act) + a final 1×1 conv (memory_encoder.py:38-55)
    down = []
    k = 0
    while sd.has(f"{prefix}mask_downsampler.encoder.{k + 1}.weight"):
        down.append({
            "conv": _conv(sd, f"{prefix}mask_downsampler.encoder.{k}"),
            "ln": _ln(sd, f"{prefix}mask_downsampler.encoder.{k + 1}"),
        })
        k += 3
    p: Dict[str, Any] = {
        "mask_down": down,
        "mask_out": _conv(sd, f"{prefix}mask_downsampler.encoder.{k}"),
        "pix_proj": _conv(sd, prefix + "pix_feat_proj"),
        "cx": [],
    }
    i = 0
    while sd.has(f"{prefix}fuser.layers.{i}.gamma"):
        lp = f"{prefix}fuser.layers.{i}"
        p["cx"].append({
            "dw": _dwconv(sd, lp + ".dwconv"),
            "ln": _ln(sd, lp + ".norm"),
            "pw1": _lin(sd, lp + ".pwconv1"),
            "pw2": _lin(sd, lp + ".pwconv2"),
            "gamma": jnp.asarray(sd.take(lp + ".gamma")),
        })
        i += 1
    p["out_proj"] = (
        _conv(sd, prefix + "out_proj")
        if sd.has(prefix + "out_proj.weight") else None
    )
    return p


def convert_memory_attention(
    sd: _SD, prefix: str = "memory_attention.", heads: int = 1
) -> Dict:
    layers = []
    i = 0
    while sd.has(f"{prefix}layers.{i}.norm1.weight"):
        lp = f"{prefix}layers.{i}"
        layers.append({
            "self_attn": _attn(sd, lp + ".self_attn", heads),
            "cross_attn": _attn(sd, lp + ".cross_attn_image", heads),
            "norm1": _ln(sd, lp + ".norm1"),
            "norm2": _ln(sd, lp + ".norm2"),
            "norm3": _ln(sd, lp + ".norm3"),
            "ff1": _lin(sd, lp + ".linear1"),
            "ff2": _lin(sd, lp + ".linear2"),
        })
        i += 1
    return {"layers": layers, "norm": _ln(sd, prefix + "norm")}


# ---------------------------------------------------------------------------
# full checkpoint
# ---------------------------------------------------------------------------


def convert_sam2_checkpoint(
    state_dict: Dict[str, Any], cfg: SAM2Config
) -> Tuple[Dict[str, Any], List[str]]:
    """Convert a full reference ``SAM2Base`` state dict (possibly nested
    under a ``model`` key, as the released SAM2 checkpoints are) into a
    :class:`SAM2Model` params pytree. Returns ``(params, unconsumed)``
    where ``unconsumed`` lists any checkpoint keys the converter did not
    map (empty for the sam2.1 architecture)."""
    if "model" in state_dict and not any(
        k.startswith(("image_encoder.", "sam_")) for k in state_dict
    ):
        state_dict = state_dict["model"]
    sd = _SD(state_dict)
    params: Dict[str, Any] = {
        "hiera": convert_hiera(sd),
        "neck": convert_fpn_neck(sd),
        "prompt": convert_prompt_encoder(sd),
        "decoder": convert_mask_decoder(sd, heads=cfg.dec_heads),
        "mem_enc": convert_memory_encoder(sd),
        "mem_attn": convert_memory_attention(sd),
    }
    # SAM2Base top-level parameters (sam2_base.py:113-256)
    direct = {
        "maskmem_tpos_enc": "maskmem_tpos_enc",
        "no_mem_embed": "no_mem_embed",
        "no_mem_pos_enc": "no_mem_pos_enc",
        "no_obj_ptr": "no_obj_ptr",
        "no_obj_embed_spatial": "no_obj_embed_spatial",
    }
    for ref, ours in direct.items():
        if sd.has(ref):
            params[ours] = jnp.asarray(sd.take(ref))
    if sd.has("obj_ptr_proj.layers.0.weight"):
        params["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
    elif sd.has("obj_ptr_proj.weight"):  # single Linear variant
        params["obj_ptr_proj"] = [_lin(sd, "obj_ptr_proj")]
    if sd.has("obj_ptr_tpos_proj.weight"):
        params["obj_ptr_tpos_proj"] = _lin(sd, "obj_ptr_tpos_proj")
    if sd.has("mask_downsample.weight"):
        params["mask_downsample"] = _conv(sd, "mask_downsample")
    return params, sd.unconsumed()
