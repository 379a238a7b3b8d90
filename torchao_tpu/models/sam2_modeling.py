"""SAM2 full architecture, TPU-native (functional JAX).

Architecture-faithful re-design of the reference port at
``torchao/_models/sam2/modeling/`` (Hiera trunk ``backbones/hieradet.py``,
FPN neck ``backbones/image_encoder.py``, prompt encoder
``sam/prompt_encoder.py``, two-way-transformer mask decoder
``sam/mask_decoder.py`` + ``sam/transformer.py``, memory encoder
``memory_encoder.py``, memory attention ``memory_attention.py``, sine
position encoding ``position_encoding.py``) — NOT a translation: params
are pytrees, images are channels-LAST (the TPU conv layout), every
matmul routes through ``torchao_tpu.ops.linear`` so all quantization /
sparsity / QAT configs compose, and the video loop keeps a fixed-size
rolling memory bank (static shapes under jit).

Scope note (recorded): the reference additionally ships predictor
harnesses (``sam2_video_predictor.py`` 1,192 LoC, image predictor,
automatic mask generator) whose substance is prompt bookkeeping around
these modules; :class:`SAM2Model`'s ``forward_image`` / ``track_step`` /
``propagate_in_video`` cover the compute path they drive. Checkpoint
import needs a name-mapping pass over a real SAM2 checkpoint (zero
egress here); the module structure mirrors the reference one-to-one so
that mapping is mechanical.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu import ops
from torchao_tpu.models.llama.model import _layer_weight


# ---------------------------------------------------------------------------
# small building blocks
# ---------------------------------------------------------------------------


def layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, lw):
    out = ops.linear(x, _layer_weight(lw["weight"]))
    if lw.get("bias") is not None:
        out = out + lw["bias"]
    return out


def _gelu(x):
    # torch nn.GELU default is the exact erf form; jax.nn.gelu defaults
    # to the tanh approximation — force exact for reference parity
    return jax.nn.gelu(x, approximate=False)


def _mlp(x, lws, act=jax.nn.relu):
    """Reference ``MLP`` (sam2_utils.py): stack of linears, act between."""
    n = len(lws)
    for i, lw in enumerate(lws):
        x = _linear(x, lw)
        if i < n - 1:
            x = act(x)
    return x


def _conv(x_nhwc, w_hwio, b=None, stride=1, padding="SAME",
          feature_group_count=1):
    out = jax.lax.conv_general_dilated(
        x_nhwc, w_hwio,
        window_strides=(stride, stride) if isinstance(stride, int)
        else stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if b is not None:
        out = out + b
    return out


def _init_linear(key, din, dout, bias=True, scale=None):
    k1, k2 = jax.random.split(key)
    s = scale if scale is not None else 1.0 / math.sqrt(din)
    lw = {"weight": jax.random.normal(k1, (dout, din), jnp.float32) * s}
    lw["bias"] = jnp.zeros((dout,)) if bias else None
    return lw


def _init_ln(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _init_conv(key, kh, kw, cin, cout):
    s = 1.0 / math.sqrt(kh * kw * cin)
    return {
        "weight": jax.random.normal(key, (kh, kw, cin, cout)) * s,
        "bias": jnp.zeros((cout,)),
    }


# ---------------------------------------------------------------------------
# position encodings (position_encoding.py)
# ---------------------------------------------------------------------------


def sine_position_encoding(h, w, dim, temperature=10000.0):
    """PositionEmbeddingSine: [H, W, dim] (channels-last)."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w)) / (h + 1e-6) * 2 * math.pi
    x = jnp.broadcast_to(x, (h, w)) / (w + 1e-6) * 2 * math.pi
    npos = dim // 2
    dim_t = temperature ** (
        2 * (jnp.arange(npos) // 2).astype(jnp.float32) / npos
    )
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack(
        [jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1
    ).reshape(h, w, npos)
    py = jnp.stack(
        [jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1
    ).reshape(h, w, npos)
    return jnp.concatenate([py, px], axis=-1)


def random_fourier_pe(coords01, gauss_mat):
    """PositionEmbeddingRandom.forward_with_coords: coords in [0,1] →
    [..., 2·F] features (F = gauss_mat rows)."""
    c = 2.0 * coords01 - 1.0
    proj = c @ gauss_mat.T * (2 * math.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def rotary_2d(q, k, hw: Tuple[int, int], theta=10000.0,
              num_k_exclude: int = 0, repeat_freqs_k: bool = False):
    """RoPEAttention's axial 2-D rotary embedding over an h×w token grid
    (transformer.py:296 + position_encoding.py:173 ``compute_axial_cis``
    / ``apply_rotary_enc``): the first d/4 head-dim PAIRS rotate with the
    COLUMN index (t_x = pos % w), the next d/4 with the ROW index
    (t_y = pos // w); pair j's frequency is ``theta**(-4j/d)`` for both
    axes. ``num_k_exclude`` trailing k tokens (object-pointer tokens)
    skip rotation; ``repeat_freqs_k`` tiles the grid angles along k's
    token axis (cross-attention to an r-frame memory bank —
    ``RoPEAttention(rope_k_repeat=True)``)."""
    *lead, n, dh = q.shape
    h, w = hw
    pos = jnp.arange(h * w)
    ty = (pos // w).astype(jnp.float32)
    tx = (pos % w).astype(jnp.float32)
    # freqs_x == freqs_y == theta**(-arange(0, d, 4)[: d//4] / d)
    freqs = 1.0 / (
        theta ** (
            jnp.arange(0, dh, 4, dtype=jnp.float32)[: dh // 4] / dh
        )
    )
    angx = tx[:, None] * freqs[None, :]
    angy = ty[:, None] * freqs[None, :]
    ang = jnp.concatenate([angx, angy], axis=-1)  # [h·w, d/2], x first

    def rot(x, a):
        # x [..., n, d], a [n, d/2] (broadcasts over leading dims)
        x2 = x.reshape(*x.shape[:-1], -1, 2)
        cos, sin = jnp.cos(a), jnp.sin(a)
        xr = jnp.stack(
            [
                x2[..., 0] * cos - x2[..., 1] * sin,
                x2[..., 0] * sin + x2[..., 1] * cos,
            ],
            axis=-1,
        )
        return xr.reshape(x.shape)

    qr = rot(q, ang[: q.shape[-2]])
    n_rope = k.shape[-2] - num_k_exclude
    if repeat_freqs_k and n_rope > h * w:
        assert n_rope % (h * w) == 0, (
            f"rotary_2d(repeat_freqs_k): rotated k count {n_rope} must "
            f"be a multiple of the h*w grid {h * w} — a mis-packed "
            "memory bank would get misaligned angles"
        )
        r = n_rope // (h * w)
        ka = jnp.tile(ang, (r, 1))
    else:
        ka = ang[:n_rope]
    head = rot(k[..., :n_rope, :], ka)
    kr = jnp.concatenate([head, k[..., n_rope:, :]], axis=-2)
    return qr, kr


# ---------------------------------------------------------------------------
# Hiera trunk (backbones/hieradet.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HieraArgs:
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_stride: Tuple[int, int] = (2, 2)
    q_pool: int = 3
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    window_pos_bkg: Tuple[int, int] = (14, 14)
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    in_chans: int = 3

    @property
    def depth(self):
        return sum(self.stages)

    @property
    def stage_ends(self):
        return [
            sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))
        ]

    def block_plan(self):
        """Per-block (dim, dim_out, heads, window, q_pool) — the exact
        dim/head/window schedule of hieradet.py:237-269."""
        plan = []
        dim, heads = self.embed_dim, self.num_heads
        stage_ends = self.stage_ends
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]
        cur_stage = 1
        for i in range(self.depth):
            dim_out = dim
            window = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            plan.append({
                "dim": dim, "dim_out": dim_out, "heads": heads,
                "window": window, "q_pool": i in q_pool_blocks,
            })
            dim = dim_out
        return plan

    @property
    def channel_list(self):
        plan = self.block_plan()
        return [plan[e]["dim_out"] for e in self.stage_ends][::-1]


def _bicubic_resize_torch(x_hwc, out_hw):
    """Bicubic upsampling matching ``F.interpolate(mode="bicubic",
    align_corners=False)`` bit-for-bit in f32: Keys kernel with
    a = −0.75 (torch's choice; ``jax.image.resize`` uses a = −0.5),
    half-pixel centers, edge-clamped taps. Separable: one [out, in]
    weight matrix per axis applied with matmuls."""
    H, W, _ = x_hwc.shape

    def axis_weights(n_out, n_in):
        a = -0.75
        i = np.arange(n_out, dtype=np.float64)
        src = (i + 0.5) * (n_in / n_out) - 0.5
        f = np.floor(src)
        t = src - f                     # in [0, 1)
        # taps at offsets -1, 0, 1, 2 of the Keys kernel
        def k(x):
            x = np.abs(x)
            return np.where(
                x <= 1, ((a + 2) * x - (a + 3)) * x * x + 1,
                np.where(
                    x < 2, ((a * x - 5 * a) * x + 8 * a) * x - 4 * a, 0.0
                ),
            )
        wm = np.zeros((n_out, n_in))
        for o in range(-1, 3):
            idx = np.clip(f + o, 0, n_in - 1).astype(int)
            np.add.at(wm, (np.arange(n_out), idx), k(t - o))
        return jnp.asarray(wm, jnp.float32)

    wh = axis_weights(out_hw[0], H)
    ww = axis_weights(out_hw[1], W)
    y = jnp.einsum("oh,hwc->owc", wh, x_hwc.astype(jnp.float32))
    return jnp.einsum("pw,owc->opc", ww, y).astype(x_hwc.dtype)


def init_hiera(key, args: HieraArgs):
    keys = jax.random.split(key, args.depth * 6 + 3)
    ki = iter(keys)
    params: Dict[str, Any] = {
        "patch_embed": _init_conv(
            next(ki), args.patch_kernel, args.patch_kernel,
            args.in_chans, args.embed_dim,
        ),
        "pos_embed": jnp.zeros(
            (args.window_pos_bkg[0], args.window_pos_bkg[1],
             args.embed_dim)
        ),
        "pos_embed_window": jnp.zeros(
            (args.window_spec[0], args.window_spec[0], args.embed_dim)
        ),
        "blocks": [],
    }
    for p in args.block_plan():
        blk = {
            "norm1": _init_ln(p["dim"]),
            "qkv": _init_linear(next(ki), p["dim"], 3 * p["dim_out"]),
            "proj_attn": _init_linear(
                next(ki), p["dim_out"], p["dim_out"]
            ),
            "norm2": _init_ln(p["dim_out"]),
            "mlp": [
                _init_linear(
                    next(ki), p["dim_out"],
                    int(p["dim_out"] * args.mlp_ratio),
                ),
                _init_linear(
                    next(ki), int(p["dim_out"] * args.mlp_ratio),
                    p["dim_out"],
                ),
            ],
        }
        if p["dim"] != p["dim_out"]:
            blk["proj"] = _init_linear(next(ki), p["dim"], p["dim_out"])
        params["blocks"].append(blk)
    return params


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return win, (Hp, Wp)


def _window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _max_pool2(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, stride[0], stride[1], 1), (1, stride[0], stride[1], 1),
        "VALID",
    )


def _sdpa(q, k, v):
    """[B, N, heads, Dh] token attention."""
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(q.shape[-1])
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.transpose(0, 2, 1, 3)


def _hiera_block(x, blk, plan, q_stride):
    B, H, W, _ = x.shape
    shortcut = x
    xn = layer_norm(x, blk["norm1"]["weight"], blk["norm1"]["bias"])
    if "proj" in blk:
        sc = _linear(xn, blk["proj"])
        if plan["q_pool"]:
            sc = _max_pool2(sc, q_stride)
        shortcut = sc

    ws = plan["window"]
    if ws > 0:
        xw, pad_hw = _window_partition(xn, ws)
    else:
        xw, pad_hw = xn, (H, W)

    # MultiScaleAttention on [b, h, w, C] windows (or the full grid)
    b, h, w, _ = xw.shape
    qkv = _linear(xw, blk["qkv"]).reshape(
        b, h * w, 3, plan["heads"], -1
    )
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if plan["q_pool"]:
        qs = q.reshape(b, h, w, -1)
        qs = _max_pool2(qs, q_stride)
        h2, w2 = qs.shape[1:3]
        q = qs.reshape(b, h2 * w2, plan["heads"], -1)
    att = _sdpa(q, k, v)
    if plan["q_pool"]:
        att = att.reshape(b, h2, w2, -1)
    else:
        att = att.reshape(b, h, w, -1)
    att = _linear(att, blk["proj_attn"])

    if plan["q_pool"]:
        H2, W2 = shortcut.shape[1:3]
        if ws > 0:
            ws2 = ws // q_stride[0]
            ph = (ws2 - H2 % ws2) % ws2
            pw = (ws2 - W2 % ws2) % ws2
            att = _window_unpartition(
                att, ws2, (H2 + ph, W2 + pw), (H2, W2)
            )
    elif ws > 0:
        att = _window_unpartition(att, ws, pad_hw, (H, W))

    x = shortcut + att
    xn2 = layer_norm(x, blk["norm2"]["weight"], blk["norm2"]["bias"])
    x = x + _mlp(xn2, blk["mlp"], act=_gelu)
    return x


def hiera_forward(params, args: HieraArgs, images_nhwc):
    """images [B, H, W, 3] → list of stage features (channels-last),
    high-res first (reference returns stage-end features)."""
    pad = args.patch_kernel // 2
    x = _conv(
        images_nhwc, params["patch_embed"]["weight"],
        params["patch_embed"]["bias"], stride=args.patch_stride,
        padding=[(pad, pad), (pad, pad)],
    )
    B, H, W, C = x.shape
    # windowed pos embed: background interpolated + window tile
    # (torch-exact bicubic — hieradet.py:289 F.interpolate(bicubic))
    bkg = _bicubic_resize_torch(params["pos_embed"], (H, W))
    wsz = params["pos_embed_window"].shape[0]
    tile = jnp.tile(
        params["pos_embed_window"],
        ((H + wsz - 1) // wsz, (W + wsz - 1) // wsz, 1),
    )[:H, :W]
    x = x + bkg + tile

    outputs = []
    plan = args.block_plan()
    ends = set(args.stage_ends)
    for i, blk in enumerate(params["blocks"]):
        x = _hiera_block(x, blk, plan[i], args.q_stride)
        if i in ends:
            outputs.append(x)
    return outputs


# ---------------------------------------------------------------------------
# FPN neck (backbones/image_encoder.py)
# ---------------------------------------------------------------------------


def init_fpn_neck(key, backbone_channels: Sequence[int], d_model: int):
    keys = jax.random.split(key, len(backbone_channels))
    # reference iterates channel_list (LOW-res first); convs[n-i] maps
    # to feature i — store per-feature convs directly (high-res first)
    return {
        "convs": [
            _init_conv(k, 1, 1, c, d_model)
            for k, c in zip(keys, reversed(list(backbone_channels)))
        ]
    }


def fpn_neck_forward(params, feats: List[jnp.ndarray], d_model: int,
                     fpn_top_down_levels: Optional[Sequence[int]] = None,
                     interp: str = "nearest"):
    """feats: high-res first (hiera output order). Returns (features,
    pos) lists, high-res first — lateral 1×1 convs + top-down ×2 fusion
    (scale-factor-2 interpolation, ``fpn_interp_model`` — the reference
    config uses ``nearest``; image_encoder.py:120-131), sine position
    encodings. ``fpn_top_down_levels`` defaults to all levels like the
    reference module default (the sam2.1 configs set ``[2, 3]``)."""
    n = len(feats)
    levels = (
        set(range(n)) if fpn_top_down_levels is None
        else set(fpn_top_down_levels)
    )
    out: List[Any] = [None] * n
    pos: List[Any] = [None] * n
    prev = None
    for i in range(n - 1, -1, -1):  # low-res → high-res
        lat = _conv(
            feats[i], params["convs"][i]["weight"],
            params["convs"][i]["bias"],
        )
        if i in levels and prev is not None:
            B, H, W, C = lat.shape
            if interp == "nearest":
                # F.interpolate(scale_factor=2, mode="nearest") ==
                # exact 2×2 pixel replication
                td = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            else:
                td = jax.image.resize(
                    prev.astype(jnp.float32), (B, H, W, C),
                    method="bilinear",
                ).astype(lat.dtype)
            prev = lat + td
        else:
            prev = lat
        out[i] = prev
        B, H, W, C = prev.shape
        pos[i] = jnp.broadcast_to(
            sine_position_encoding(H, W, C)[None], prev.shape
        ).astype(prev.dtype)
    return out, pos


# ---------------------------------------------------------------------------
# prompt encoder (sam/prompt_encoder.py)
# ---------------------------------------------------------------------------


def init_prompt_encoder(key, embed_dim: int, mask_in_chans: int = 16):
    ks = jax.random.split(key, 8)
    return {
        "pe_gauss": jax.random.normal(ks[0], (embed_dim // 2, 2)),
        "point_embeddings": jax.random.normal(ks[1], (4, embed_dim)) * 0.02,
        "not_a_point": jax.random.normal(ks[2], (embed_dim,)) * 0.02,
        "no_mask": jax.random.normal(ks[3], (embed_dim,)) * 0.02,
        "mask_down": [
            _init_conv(ks[4], 2, 2, 1, mask_in_chans // 4),
            _init_conv(ks[5], 2, 2, mask_in_chans // 4, mask_in_chans),
            _init_conv(ks[6], 1, 1, mask_in_chans, embed_dim),
        ],
        "mask_ln": [
            _init_ln(mask_in_chans // 4), _init_ln(mask_in_chans),
        ],
    }


def prompt_encoder_forward(
    params,
    image_size: Tuple[int, int],
    embed_hw: Tuple[int, int],
    points: Optional[jnp.ndarray] = None,   # [B, P, 2] (x, y) pixels
    labels: Optional[jnp.ndarray] = None,   # [B, P] (1 pos, 0 neg,
    #    2/3 box corners, -1 pad)
    masks: Optional[jnp.ndarray] = None,    # [B, 4h, 4w, 1]
):
    """Returns (sparse [B, P(+1), D], dense [B, h, w, D], dense_pe)."""
    D = params["point_embeddings"].shape[-1]
    h, w = embed_hw

    # dense positional encoding over the embedding grid
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(
        jnp.meshgrid(gx, gy, indexing="xy"), axis=-1
    )  # [h, w, 2]
    dense_pe = random_fourier_pe(grid, params["pe_gauss"])

    if points is not None:
        pts = (points + 0.5) / jnp.asarray(
            [image_size[1], image_size[0]], jnp.float32
        )
        pe = random_fourier_pe(pts, params["pe_gauss"])  # [B, P, D]
        lab = labels[..., None]
        pe = jnp.where(lab == -1, params["not_a_point"], pe)
        for j in range(4):
            pe = jnp.where(
                lab == j, pe + params["point_embeddings"][j], pe
            )
        sparse = pe
    else:
        sparse = jnp.zeros((1, 0, D))

    if masks is not None:
        m = _conv(masks, params["mask_down"][0]["weight"],
                  params["mask_down"][0]["bias"], stride=2,
                  padding="VALID")
        m = _gelu(layer_norm(
            m, params["mask_ln"][0]["weight"],
            params["mask_ln"][0]["bias"],
        ))
        m = _conv(m, params["mask_down"][1]["weight"],
                  params["mask_down"][1]["bias"], stride=2,
                  padding="VALID")
        m = _gelu(layer_norm(
            m, params["mask_ln"][1]["weight"],
            params["mask_ln"][1]["bias"],
        ))
        dense = _conv(m, params["mask_down"][2]["weight"],
                      params["mask_down"][2]["bias"])
    else:
        dense = jnp.broadcast_to(
            params["no_mask"], (1, h, w, D)
        )
    return sparse, dense, dense_pe


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder (sam/transformer.py, mask_decoder.py)
# ---------------------------------------------------------------------------


class StaticInt(int):
    """An int params leaf that stays STATIC under jit: registered as an
    empty pytree whose value lives in the treedef, so ``jit`` never
    traces it (attention ``heads`` would otherwise become a traced
    scalar and break the head-split reshape)."""


jax.tree_util.register_pytree_node(
    StaticInt,
    lambda x: ((), int(x)),
    lambda aux, _: StaticInt(aux),
)


def _init_attention(key, d, heads, downsample=1):
    di = d // downsample
    ks = jax.random.split(key, 4)
    return {
        "wq": _init_linear(ks[0], d, di),
        "wk": _init_linear(ks[1], d, di),
        "wv": _init_linear(ks[2], d, di),
        "wo": _init_linear(ks[3], di, d),
        "heads": StaticInt(heads),
    }


def _attention(lw, q, k, v, rope_hw=None, num_k_exclude_rope=0,
               rope_k_repeat=False):
    heads = lw["heads"]
    B, Nq, _ = q.shape
    qh = _linear(q, lw["wq"]).reshape(B, Nq, heads, -1)
    kh = _linear(k, lw["wk"]).reshape(B, k.shape[1], heads, -1)
    vh = _linear(v, lw["wv"]).reshape(B, v.shape[1], heads, -1)
    if rope_hw is not None:
        qr = qh.transpose(0, 2, 1, 3)
        kr = kh.transpose(0, 2, 1, 3)
        qr, kr = rotary_2d(
            qr, kr, rope_hw, num_k_exclude=num_k_exclude_rope,
            repeat_freqs_k=rope_k_repeat,
        )
        qh = qr.transpose(0, 2, 1, 3)
        kh = kr.transpose(0, 2, 1, 3)
    out = _sdpa(qh, kh, vh).reshape(B, Nq, -1)
    return _linear(out, lw["wo"])


def init_two_way_transformer(key, depth, d, heads, mlp_dim,
                             downsample=2):
    ks = jax.random.split(key, depth * 8 + 2)
    ki = iter(ks)
    layers = []
    for _ in range(depth):
        layers.append({
            "self_attn": _init_attention(next(ki), d, heads),
            "norm1": _init_ln(d),
            "t2i": _init_attention(next(ki), d, heads, downsample),
            "norm2": _init_ln(d),
            "mlp": [
                _init_linear(next(ki), d, mlp_dim),
                _init_linear(next(ki), mlp_dim, d),
            ],
            "norm3": _init_ln(d),
            "i2t": _init_attention(next(ki), d, heads, downsample),
            "norm4": _init_ln(d),
        })
    return {
        "layers": layers,
        "final_t2i": _init_attention(next(ki), d, heads, downsample),
        "norm_final": _init_ln(d),
    }


def two_way_transformer_forward(params, image_emb, image_pe, tokens):
    """image_emb/pe [B, N_img, D]; tokens [B, N_tok, D]. The reference's
    4-direction block: token self-attn → token→image cross → token MLP
    → image→token cross; final token→image attn + norm."""
    queries, keys = tokens, image_emb
    eps = 1e-5  # nn.LayerNorm default (transformer.py:164-176)
    for i, lw in enumerate(params["layers"]):
        if i == 0:
            # skip_first_layer_pe: attention output REPLACES queries
            # (transformer.py:188-189 — no residual on layer 0)
            queries = _attention(
                lw["self_attn"], queries, queries, queries
            )
        else:
            q = queries + tokens
            queries = queries + _attention(lw["self_attn"], q, q, queries)
        queries = layer_norm(
            queries, lw["norm1"]["weight"], lw["norm1"]["bias"], eps
        )
        q = queries + tokens
        k = keys + image_pe
        att = _attention(lw["t2i"], q, k, keys)
        queries = layer_norm(
            queries + att, lw["norm2"]["weight"], lw["norm2"]["bias"], eps
        )
        queries = layer_norm(
            queries + _mlp(queries, lw["mlp"]),
            lw["norm3"]["weight"], lw["norm3"]["bias"], eps,
        )
        q = queries + tokens
        att = _attention(lw["i2t"], k, q, queries)
        keys = layer_norm(
            keys + att, lw["norm4"]["weight"], lw["norm4"]["bias"], eps
        )
    q = queries + tokens
    k = keys + image_pe
    att = _attention(params["final_t2i"], q, k, keys)
    queries = layer_norm(
        queries + att,
        params["norm_final"]["weight"], params["norm_final"]["bias"], eps,
    )
    return queries, keys


def init_mask_decoder(key, d, num_multimask=3, heads=8, tw_depth=2,
                      pred_obj_scores=True, use_high_res_features=True):
    num_mask_tokens = num_multimask + 1
    ks = jax.random.split(key, 16 + 3 * num_mask_tokens + 8)
    ki = iter(ks)
    p = {
        "transformer": init_two_way_transformer(
            next(ki), tw_depth, d, heads, mlp_dim=2048
        ),
        "iou_token": jax.random.normal(next(ki), (1, d)) * 0.02,
        "mask_tokens": jax.random.normal(
            next(ki), (num_mask_tokens, d)
        ) * 0.02,
        "upscale1": _init_conv(next(ki), 2, 2, d, d // 4),   # transposed
        "upscale_ln": _init_ln(d // 4),
        "upscale2": _init_conv(next(ki), 2, 2, d // 4, d // 8),
        "hyper_mlps": [
            [
                _init_linear(next(ki), d, d),
                _init_linear(next(ki), d, d),
                _init_linear(next(ki), d, d // 8),
            ]
            for _ in range(num_mask_tokens)
        ],
        "iou_head": [
            _init_linear(next(ki), d, 256),
            _init_linear(next(ki), 256, 256),
            _init_linear(next(ki), 256, num_mask_tokens),
        ],
    }
    if pred_obj_scores:
        p["obj_score_token"] = jax.random.normal(next(ki), (1, d)) * 0.02
        # sam2.1 configs set pred_obj_scores_mlp=true → MLP(d, d, 1, 3)
        # (mask_decoder.py:99-102)
        p["obj_score_head"] = [
            _init_linear(next(ki), d, d),
            _init_linear(next(ki), d, d),
            _init_linear(next(ki), d, 1),
        ]
    if use_high_res_features:
        p["conv_s0"] = _init_conv(next(ki), 1, 1, d, d // 8)
        p["conv_s1"] = _init_conv(next(ki), 1, 1, d, d // 4)
    return p


def _conv_transpose2(x, w_hwio, b, stride=2):
    out = jax.lax.conv_transpose(
        x, w_hwio, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def mask_decoder_forward(
    params,
    image_emb,          # [B, h, w, D]
    image_pe,           # [B, h, w, D]
    sparse_prompts,     # [B, P, D]
    dense_prompts,      # [B, h, w, D]
    high_res_feats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    multimask_output: bool = True,
    stability_delta: float = 0.05,
    stability_thresh: float = 0.98,
    dynamic_multimask_via_stability: bool = False,
    iou_use_sigmoid: bool = True,
):
    """Returns (masks [B, M, 4h, 4w], iou [B, M], sam_tokens [B, M, D],
    obj_score [B, 1])."""
    B, h, w, D = image_emb.shape
    has_obj = "obj_score_token" in params
    fixed = [params["iou_token"], params["mask_tokens"]]
    if has_obj:
        fixed = [params["obj_score_token"]] + fixed
    tok = jnp.concatenate(fixed, axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(tok[None], (B,) + tok.shape), sparse_prompts],
        axis=1,
    )
    src = (image_emb + dense_prompts).reshape(B, h * w, D)
    pe = image_pe.reshape(B, h * w, D)

    hs, src_out = two_way_transformer_forward(
        params["transformer"], src, pe, tokens
    )
    s = 1 if has_obj else 0
    iou_tok = hs[:, s]
    n_mask = params["mask_tokens"].shape[0]
    mask_toks = hs[:, s + 1 : s + 1 + n_mask]

    src_img = src_out.reshape(B, h, w, D)
    up = _conv_transpose2(
        src_img, params["upscale1"]["weight"], params["upscale1"]["bias"]
    )
    if high_res_feats is not None:
        s0, s1 = high_res_feats
        up = up + _conv(
            s1, params["conv_s1"]["weight"], params["conv_s1"]["bias"]
        )
    up = _gelu(layer_norm(
        up, params["upscale_ln"]["weight"], params["upscale_ln"]["bias"]
    ))
    up = _conv_transpose2(
        up, params["upscale2"]["weight"], params["upscale2"]["bias"]
    )
    if high_res_feats is not None:
        up = up + _conv(
            s0, params["conv_s0"]["weight"], params["conv_s0"]["bias"]
        )
    up = _gelu(up)                       # [B, 4h, 4w, D/8]

    hyper = jnp.stack(
        [
            _mlp(mask_toks[:, i], params["hyper_mlps"][i])
            for i in range(n_mask)
        ],
        axis=1,
    )                                           # [B, M, D/8]
    masks = jnp.einsum(
        "bmc,bhwc->bmhw", hyper, up,
        preferred_element_type=jnp.float32,
    )
    iou = _mlp(iou_tok, params["iou_head"])     # [B, M]
    if iou_use_sigmoid:
        # iou_prediction_use_sigmoid=true in the sam2.1 configs
        # (sam2_utils.py MLP ``sigmoid_output``)
        iou = jax.nn.sigmoid(iou)
    obj = (
        _mlp(hs[:, 0], params["obj_score_head"])
        if has_obj else jnp.full((B, 1), 10.0)
    )

    if multimask_output:
        out_masks, out_iou = masks[:, 1:], iou[:, 1:]
    elif dynamic_multimask_via_stability:
        # reference mask_decoder.py:281: replace an unstable single mask
        # with the best multimask candidate
        single = masks[:, 0]
        area_i = jnp.sum(single > stability_delta, axis=(-1, -2))
        area_u = jnp.sum(single > -stability_delta, axis=(-1, -2))
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
        best = jnp.argmax(iou[:, 1:], axis=-1)
        multi = jnp.take_along_axis(
            masks[:, 1:], best[:, None, None, None], axis=1
        )[:, 0]
        multi_iou = jnp.take_along_axis(
            iou[:, 1:], best[:, None], axis=1
        )
        stable = (stability >= stability_thresh)[:, None]
        out_masks = jnp.where(
            stable[..., None, None], single[:, None], multi[:, None]
        )
        out_iou = jnp.where(stable, iou[:, :1], multi_iou)
    else:
        out_masks, out_iou = masks[:, :1], iou[:, :1]
    return out_masks, out_iou, mask_toks, obj


# ---------------------------------------------------------------------------
# memory encoder + memory attention (memory_encoder.py, memory_attention.py)
# ---------------------------------------------------------------------------


def init_memory_encoder(key, in_dim, out_dim, mask_down_stages=4,
                        num_cx=2):
    ks = jax.random.split(key, mask_down_stages + num_cx * 6 + 8)
    ki = iter(ks)
    down, c = [], 1
    for _ in range(mask_down_stages):
        # reference MaskDownSampler (memory_encoder.py:40-55): channels
        # multiply by stride² (=4) each stage regardless of embed_dim
        nc = c * 4
        down.append({
            "conv": _init_conv(next(ki), 3, 3, c, nc),
            "ln": _init_ln(nc),
        })
        c = nc
    p = {
        "mask_down": down,
        "mask_out": _init_conv(next(ki), 1, 1, c, in_dim),
        "pix_proj": _init_conv(next(ki), 1, 1, in_dim, in_dim),
        "cx": [
            {
                # ConvNeXt block: depthwise 7×7 + LN + pw MLP + gamma
                "dw": _init_conv(next(ki), 7, 7, 1, in_dim),
                "ln": _init_ln(in_dim),
                "pw1": _init_linear(next(ki), in_dim, 4 * in_dim),
                "pw2": _init_linear(next(ki), 4 * in_dim, in_dim),
                "gamma": jnp.full((in_dim,), 1e-6),
            }
            for _ in range(num_cx)
        ],
        "out_proj": (
            _init_conv(next(ki), 1, 1, in_dim, out_dim)
            if out_dim != in_dim else None
        ),
    }
    return p


def memory_encoder_forward(params, pix_feat, masks,
                           skip_mask_sigmoid=False):
    """pix_feat [B, h, w, C]; masks [B, H_img, W_img, 1] (16× the
    feature res, like the reference's downsampler total stride)."""
    m = masks if skip_mask_sigmoid else jax.nn.sigmoid(masks)
    for st in params["mask_down"]:
        # torch Conv2d(k=3, s=2, p=1) pads symmetrically; XLA "SAME"
        # would pad (0, 1) on even dims — different samples
        m = _conv(m, st["conv"]["weight"], st["conv"]["bias"], stride=2,
                  padding=[(1, 1), (1, 1)])
        m = _gelu(layer_norm(
            m, st["ln"]["weight"], st["ln"]["bias"]
        ))
    m = _conv(
        m, params["mask_out"]["weight"], params["mask_out"]["bias"]
    )
    x = _conv(
        pix_feat, params["pix_proj"]["weight"],
        params["pix_proj"]["bias"],
    )
    x = x + m
    for cx in params["cx"]:
        # depthwise 7×7 (feature_group_count = C)
        C = x.shape[-1]
        dw = jnp.transpose(cx["dw"]["weight"], (0, 1, 2, 3))
        h = _conv(
            x, jnp.broadcast_to(dw, (7, 7, 1, C)), cx["dw"]["bias"],
            feature_group_count=C,
        )
        h = layer_norm(h, cx["ln"]["weight"], cx["ln"]["bias"])
        h = _linear(h, cx["pw1"])
        h = _gelu(h)
        h = _linear(h, cx["pw2"])
        x = x + cx["gamma"] * h
    if params["out_proj"] is not None:
        x = _conv(
            x, params["out_proj"]["weight"], params["out_proj"]["bias"]
        )
    B, h, w, C = x.shape
    pos = jnp.broadcast_to(
        sine_position_encoding(h, w, C)[None], x.shape
    ).astype(x.dtype)
    return x, pos


def init_memory_attention(key, d_model, num_layers=4, heads=1,
                          dim_ff=2048, kv_dim=64):
    ks = jax.random.split(key, num_layers * 8 + 2)
    ki = iter(ks)
    layers = []
    for _ in range(num_layers):
        ca = _init_attention(next(ki), d_model, heads)
        # cross-attn keys/values come from the (smaller) memory dim
        ca["wk"] = _init_linear(next(ki), kv_dim, d_model)
        ca["wv"] = _init_linear(next(ki), kv_dim, d_model)
        layers.append({
            "self_attn": _init_attention(next(ki), d_model, heads),
            "cross_attn": ca,
            "norm1": _init_ln(d_model),
            "norm2": _init_ln(d_model),
            "norm3": _init_ln(d_model),
            "ff1": _init_linear(next(ki), d_model, dim_ff),
            "ff2": _init_linear(next(ki), dim_ff, d_model),
        })
    return {"layers": layers, "norm": _init_ln(d_model)}


def get_1d_sine_pe(pos, dim, temperature=10000.0):
    """sam2_utils.py:64 ``get_1d_sine_pe`` — 1-D sine embedding."""
    pe_dim = dim // 2
    dim_t = temperature ** (
        2 * (jnp.arange(pe_dim, dtype=jnp.float32) // 2) / pe_dim
    )
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def memory_attention_forward(params, curr, memory, curr_pos, mem_pos,
                             hw: Tuple[int, int],
                             num_obj_ptr_tokens: int = 0):
    """curr [B, N, D]; memory [B, M, kv_dim]. Replicates the reference
    defaults (configs/sam2.1/*.yaml + memory_attention.py:58-98):
    ``pos_enc_at_input`` adds ``0.1·curr_pos`` once at the input;
    self-attention is RoPE over the current-frame grid with NO additive
    pos (``pos_enc_at_attn=false``); cross-attention RoPE-rotates q on
    the grid and k over the repeated per-frame memory grid
    (``rope_k_repeat``), with the trailing ``num_obj_ptr_tokens``
    object-pointer tokens excluded from rotation; cross-attn keys add
    ``mem_pos`` (``pos_enc_at_cross_attn_keys=true``) but queries add
    nothing (``pos_enc_at_cross_attn_queries=false``)."""
    x = curr + 0.1 * curr_pos
    eps = 1e-5  # nn.LayerNorm default (memory_attention.py:41-43)
    for lw in params["layers"]:
        h = layer_norm(x, lw["norm1"]["weight"], lw["norm1"]["bias"], eps)
        att = _attention(lw["self_attn"], h, h, h, rope_hw=hw)
        x = x + att
        h = layer_norm(x, lw["norm2"]["weight"], lw["norm2"]["bias"], eps)
        att = _attention(
            lw["cross_attn"], h, memory + mem_pos, memory,
            rope_hw=hw, num_k_exclude_rope=num_obj_ptr_tokens,
            rope_k_repeat=True,
        )
        x = x + att
        h = layer_norm(x, lw["norm3"]["weight"], lw["norm3"]["bias"], eps)
        x = x + _linear(jax.nn.relu(_linear(h, lw["ff1"])), lw["ff2"])
    return layer_norm(
        x, params["norm"]["weight"], params["norm"]["bias"], eps
    )


# ---------------------------------------------------------------------------
# SAM2 model: image forward + track step + video propagation
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SAM2Config:
    image_size: int = 256
    d_model: int = 64            # FPN/decoder dim (reference: 256)
    mem_dim: int = 16            # memory channel dim (reference: 64)
    num_mem_frames: int = 7
    num_mem_layers: int = 2
    dec_heads: int = 4
    # sam2.1 config defaults (configs/sam2.1/*.yaml)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    directly_add_no_mem_embed: bool = True
    hiera: HieraArgs = dataclasses.field(
        default_factory=lambda: HieraArgs(
            embed_dim=32, num_heads=1, stages=(1, 2, 4, 2),
            global_att_blocks=(4,), window_spec=(4, 4, 4, 4),
        )
    )

    @classmethod
    def reference_base(cls):
        """The reference's hiera-base-plus geometry (sam2_base scale);
        dec_heads=8 is hardcoded by ``SAM2Base._build_sam_heads``."""
        return cls(
            image_size=1024, d_model=256, mem_dim=64, dec_heads=8,
            num_mem_layers=4,
            hiera=HieraArgs(embed_dim=112, num_heads=2),
        )


class SAM2Model:
    """Full-architecture SAM2 (functional): image encoder (Hiera+FPN),
    prompt encoder, two-way mask decoder, memory encoder/attention, and
    a rolling-memory video loop."""

    def __init__(self, config: SAM2Config):
        self.cfg = config

    def init_params(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        ks = jax.random.split(key, 12)
        d = cfg.d_model
        return {
            "hiera": init_hiera(ks[0], cfg.hiera),
            "neck": init_fpn_neck(ks[1], cfg.hiera.channel_list, d),
            "prompt": init_prompt_encoder(ks[2], d),
            "decoder": init_mask_decoder(
                ks[3], d, heads=cfg.dec_heads
            ),
            "mem_enc": init_memory_encoder(ks[4], d, cfg.mem_dim),
            "mem_attn": init_memory_attention(
                ks[5], d, num_layers=cfg.num_mem_layers,
                kv_dim=cfg.mem_dim,
            ),
            # SAM2Base top-level parameters (sam2_base.py:113-256)
            "no_mem_embed": jax.random.normal(ks[6], (1, 1, d)) * 0.02,
            "no_mem_pos_enc": jax.random.normal(ks[7], (1, 1, d)) * 0.02,
            "maskmem_tpos_enc": jax.random.normal(
                ks[8], (cfg.num_mem_frames, 1, 1, cfg.mem_dim)
            ) * 0.02,
            "no_obj_ptr": jax.random.normal(ks[9], (1, d)) * 0.02,
            "no_obj_embed_spatial": jax.random.normal(
                ks[10], (1, cfg.mem_dim)
            ) * 0.02,
            # use_mlp_for_obj_ptr_proj=true → MLP(d, d, d, 3)
            "obj_ptr_proj": [
                _init_linear(k, d, d)
                for k in jax.random.split(ks[11], 3)
            ],
            # proj_tpos_enc_in_obj_ptrs=true → Linear(d, mem_dim)
            "obj_ptr_tpos_proj": _init_linear(
                jax.random.fold_in(ks[11], 7), d, cfg.mem_dim
            ),
            # use_obj_ptrs_in_encoder=true → Conv2d(1, 1, 4, 4)
            "mask_downsample": _init_conv(
                jax.random.fold_in(ks[11], 8), 4, 4, 1, 1
            ),
        }

    # ---- image path ---------------------------------------------------
    def forward_image(self, params, images_nhwc):
        feats = hiera_forward(params["hiera"], self.cfg.hiera, images_nhwc)
        features, pos = fpn_neck_forward(
            params["neck"], feats, self.cfg.d_model,
            fpn_top_down_levels=self.cfg.fpn_top_down_levels,
        )
        # reference scalp=1 (image_encoder.py:40): DROP the lowest-res
        # level; the decoder feature is the stride-16 level, with
        # stride-4/8 levels as the mask decoder's high-res skips
        features, pos = features[:-1], pos[:-1]
        return {
            "backbone_fpn": features,   # high-res first: strides 4, 8, 16
            "vision_pos_enc": pos,
            "vision_features": features[-1],
        }

    def predict_masks(
        self, params, backbone_out, points=None, labels=None,
        multimask_output=True, pix_feat_override=None,
    ):
        feats = backbone_out["backbone_fpn"]
        src = (
            pix_feat_override if pix_feat_override is not None
            else feats[-1]
        )
        B, h, w, Dm = src.shape
        sparse, dense, dense_pe = prompt_encoder_forward(
            params["prompt"],
            (self.cfg.image_size, self.cfg.image_size), (h, w),
            points=points, labels=labels,
        )
        if sparse.shape[0] != B:
            sparse = jnp.broadcast_to(
                sparse, (B,) + sparse.shape[1:]
            )
        pe = jnp.broadcast_to(dense_pe[None], src.shape)
        dense_b = jnp.broadcast_to(dense, src.shape) if dense.ndim == 4 \
            and dense.shape[0] == 1 else dense
        high_res = (
            (feats[0], feats[1]) if len(feats) >= 3 else None
        )
        return mask_decoder_forward(
            params["decoder"], src, pe, sparse, dense_b,
            high_res_feats=high_res,
            multimask_output=multimask_output,
        )

    # ---- video path ---------------------------------------------------
    def track_step(self, params, backbone_out, mem_bank, points=None,
                   labels=None, obj_ptrs=None,
                   max_obj_ptrs_in_encoder: int = 16):
        """One frame: condition current features on the memory bank
        (+ object-pointer tokens, sam2_base.py:595-656), decode masks,
        encode new memory; returns (masks, iou, obj,
        (mem_tokens, mem_pos, obj_ptr)).

        ``obj_ptrs``: optional [B, P, D] pointers from past frames,
        oldest-first (newest = t_diff 1). Each pointer is split into
        D/mem_dim memory tokens with a projected 1-D sine temporal
        encoding; the pointer tokens are excluded from cross-attention
        RoPE (``num_obj_ptr_tokens``)."""
        cfg = self.cfg
        src = backbone_out["vision_features"]
        B, h, w, D = src.shape
        cur = src.reshape(B, h * w, D)
        cur_pos = backbone_out["vision_pos_enc"][-1].reshape(
            B, h * w, D
        )
        if mem_bank is not None:
            mem, mem_pos = mem_bank  # [B, T·N, mem_dim] ×2
            # temporal position encoding by frame age: the rolling bank
            # is oldest-first with N tokens per frame slot; the newest
            # slot gets maskmem_tpos_enc[0] (sam2_base.py:586)
            T = cfg.num_mem_frames
            assert mem.shape[1] % T == 0, (
                f"track_step: memory bank token count {mem.shape[1]} "
                f"must be an exact multiple of num_mem_frames {T} "
                "(N tokens per frame slot, oldest-first)"
            )
            n_per = mem.shape[1] // T
            tpos = jnp.repeat(
                params["maskmem_tpos_enc"][::-1, 0, 0, :], n_per, axis=0
            )[None]                              # [1, T·N, mem_dim]
            mem_pos = mem_pos + tpos
            n_ptr_tok = 0
            if obj_ptrs is not None and obj_ptrs.shape[1] > 0:
                P = obj_ptrs.shape[1]
                md = cfg.mem_dim
                split = D // md
                # [B, P, D] -> [B, P·split, mem_dim], newest last
                ptr_tok = obj_ptrs.reshape(B, P * split, md)
                t_diff = jnp.arange(P, 0, -1, dtype=jnp.float32)
                pe = get_1d_sine_pe(
                    t_diff / (max_obj_ptrs_in_encoder - 1), D
                )                                # [P, D]
                pe = _linear(pe, params["obj_ptr_tpos_proj"])
                pe = jnp.repeat(pe, split, axis=0)[None]
                mem = jnp.concatenate([mem, ptr_tok], axis=1)
                mem_pos = jnp.concatenate(
                    [mem_pos, jnp.broadcast_to(
                        pe, (B,) + pe.shape[1:]
                    )], axis=1,
                )
                n_ptr_tok = P * split
            cond = memory_attention_forward(
                params["mem_attn"], cur, mem, cur_pos, mem_pos,
                (h, w), num_obj_ptr_tokens=n_ptr_tok,
            )
        elif cfg.directly_add_no_mem_embed:
            # first frame: sam2_base.py:659-661
            cond = cur + params["no_mem_embed"]
        else:
            cond = cur
        cond_img = cond.reshape(B, h, w, D)
        masks, iou, toks, obj = self.predict_masks(
            params, backbone_out, points=points, labels=labels,
            multimask_output=True, pix_feat_override=cond_img,
        )
        best = jnp.argmax(iou, axis=-1)
        best_mask = jnp.take_along_axis(
            masks, best[:, None, None, None], axis=1
        )[:, 0]
        # object pointer from the best multimask SAM token
        # (use_multimask_token_for_obj_ptr; sam2_base.py:396 + the
        # fixed_no_obj_ptr mix with lambda = [obj_logits > 0])
        best_tok = jnp.take_along_axis(
            toks[:, 1:], best[:, None, None], axis=1
        )[:, 0]                                   # [B, D]
        obj_ptr = _mlp(best_tok, params["obj_ptr_proj"])
        lam = (obj > 0).astype(obj_ptr.dtype)     # [B, 1]
        obj_ptr = lam * obj_ptr + (1 - lam) * params["no_obj_ptr"]
        # upsample the low-res mask logits to the mask-downsampler's
        # expected input resolution (16× the feature grid)
        m_in = jax.image.resize(
            best_mask[..., None],
            (B, h * 16, w * 16, 1), method="bilinear",
        )
        mem_feat, mem_pos_new = memory_encoder_forward(
            params["mem_enc"], cond_img, m_in
        )
        # no_obj_embed_spatial (sam2_base.py:181): down-weight memory of
        # frames where the object is predicted absent
        mem_feat = mem_feat + (1.0 - lam)[:, :, None, None] \
            * params["no_obj_embed_spatial"][0]
        mem_tokens = mem_feat.reshape(B, -1, mem_feat.shape[-1])
        mem_pos_tok = mem_pos_new.reshape(B, -1, mem_feat.shape[-1])
        return masks, iou, obj, (mem_tokens, mem_pos_tok, obj_ptr)

    def propagate_in_video(self, params, frames_nhwc, points, labels):
        """frames [T, H, W, 3]; prompt on frame 0. Rolling memory bank
        of ``num_mem_frames`` (static shape — jit-friendly) plus a
        rolling object-pointer list (sam2_base.py:616-623)."""
        cfg = self.cfg
        outs = []
        bank = bank_pos = ptrs = None
        for t in range(frames_nhwc.shape[0]):
            bo = self.forward_image(params, frames_nhwc[t : t + 1])
            mem = (
                None if bank is None
                else (bank, bank_pos)
            )
            masks, iou, obj, (mt, mp, op) = self.track_step(
                params, bo, mem,
                points=points if t == 0 else None,
                labels=labels if t == 0 else None,
                obj_ptrs=ptrs,
            )
            if bank is None:
                bank = jnp.tile(mt, (1, cfg.num_mem_frames, 1))
                bank_pos = jnp.tile(mp, (1, cfg.num_mem_frames, 1))
                ptrs = jnp.tile(
                    op[:, None], (1, cfg.num_mem_frames, 1)
                )
            else:
                n = mt.shape[1]
                bank = jnp.concatenate([bank[:, n:], mt], axis=1)
                bank_pos = jnp.concatenate(
                    [bank_pos[:, n:], mp], axis=1
                )
                ptrs = jnp.concatenate(
                    [ptrs[:, 1:], op[:, None]], axis=1
                )
            outs.append((masks, iou, obj))
        return outs
