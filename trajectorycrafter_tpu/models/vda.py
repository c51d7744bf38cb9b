"""Video-Depth-Anything (VDA) in Flax — the consistent-depth estimator.

The reference's consistent-depth subsystem drives a frozen VDA model
(notebooks/12_11_25_consistent_depth/autoregressive_alignment/main_alignment.py:80-118
loads ``VideoDepthAnything(**model_configs[encoder])`` from a non-vendored
checkout) and test-time-optimises a visual prompt against it
(depth_alignment/depth_trainer.py:51-144).  This module is a from-scratch
TPU-native rebuild of that model family:

  * DINOv2 ViT backbone (patch 14, CLS token, LayerScale, interpolated
    position embeddings) — structure parity-tested against transformers'
    torch ``Dinov2Backbone``;
  * DPT neck + relative-depth head (reassemble -> fusion -> 3-conv head) —
    parity-tested against transformers' ``DepthAnythingForDepthEstimation``;
  * VDA's temporal extension: four AnimateDiff-style motion modules at the
    official placements (two on the reassembled layer_3/layer_4 features,
    two after the deepest fusion stages -- "spatio-temporal head", Video
    Depth Anything, CVPR'25 §3.1).  Gated by ``num_temporal_blocks`` — at 0
    the model IS single-image Depth Anything and converts 1:1 from the HF
    checkpoints (LiheYoung/depth-anything-*-hf) via convert_vda; at 4 the
    full tree loads from the official video_depth_anything_*.pth via
    utils/convert.convert_vda_official (key manifest
    expected_vda_official_keys).

Everything is channel-last (NHWC / (B, T, H, W, C)); the encoder runs all
frames as one (B*T) batch (MXU-friendly), temporal attention reshapes to
(B*h*w, T, C) token streams.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet statistics used by the VDA/DepthAnything preprocessor
# (reference depth_alignment/consistent_depth.py:219).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VDAConfig:
    """Architecture hyper-parameters.

    ``encoder`` presets mirror main_alignment.py:101-105 (`model_configs`):
    vits(features 64, out [48,96,192,384]) / vitb(128, [96,192,384,768]) /
    vitl(256, [256,512,1024,1024]).
    """

    def __init__(
        self,
        hidden_size: int = 1024,
        num_hidden_layers: int = 24,
        num_attention_heads: int = 16,
        mlp_ratio: float = 4.0,
        patch_size: int = 14,
        image_size: int = 518,
        layerscale_value: float = 1.0,
        layer_norm_eps: float = 1e-6,
        out_indices: Sequence[int] = (5, 12, 18, 24),
        features: int = 256,
        out_channels: Sequence[int] = (256, 512, 1024, 1024),
        reassemble_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5),
        head_hidden_size: int = 32,
        num_temporal_blocks: int = 4,
        temporal_heads: int = 8,
    ):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.mlp_ratio = mlp_ratio
        self.patch_size = patch_size
        self.image_size = image_size
        self.layerscale_value = layerscale_value
        self.layer_norm_eps = layer_norm_eps
        # indices into [embeddings, layer1, ..., layerN] (transformers
        # Dinov2Backbone stage numbering: out_index i = after layer i)
        self.out_indices = tuple(out_indices)
        self.features = features
        self.out_channels = tuple(out_channels)
        self.reassemble_factors = tuple(reassemble_factors)
        self.head_hidden_size = head_hidden_size
        self.num_temporal_blocks = num_temporal_blocks
        self.temporal_heads = temporal_heads


def vda_vits_config(**kw) -> VDAConfig:
    kw.setdefault("hidden_size", 384)
    kw.setdefault("num_hidden_layers", 12)
    kw.setdefault("num_attention_heads", 6)
    kw.setdefault("out_indices", (3, 6, 9, 12))
    kw.setdefault("features", 64)
    kw.setdefault("out_channels", (48, 96, 192, 384))
    return VDAConfig(**kw)


def vda_vitb_config(**kw) -> VDAConfig:
    kw.setdefault("hidden_size", 768)
    kw.setdefault("num_hidden_layers", 12)
    kw.setdefault("num_attention_heads", 12)
    kw.setdefault("out_indices", (3, 6, 9, 12))
    kw.setdefault("features", 128)
    kw.setdefault("out_channels", (96, 192, 384, 768))
    return VDAConfig(**kw)


def vda_vitl_config(**kw) -> VDAConfig:
    return VDAConfig(**kw)


# ---------------------------------------------------------------------------
# DINOv2 backbone
# ---------------------------------------------------------------------------


class Dinov2MLP(nn.Module):
    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.cfg.hidden_size * self.cfg.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(h)


class Dinov2Attention(nn.Module):
    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, s, _ = x.shape
        nh = c.num_attention_heads
        hd = c.hidden_size // nh
        dense = lambda n: nn.Dense(c.hidden_size, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        q = dense("query")(x).reshape(b, s, nh, hd)
        k = dense("key")(x).reshape(b, s, nh, hd)
        v = dense("value")(x).reshape(b, s, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, c.hidden_size)
        return dense("out")(out)


class Dinov2Layer(nn.Module):
    """Pre-norm ViT block with LayerScale (torch Dinov2Layer)."""

    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ln = lambda n: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        ls1 = self.param("layer_scale1",
                         nn.initializers.constant(c.layerscale_value),
                         (c.hidden_size,), self.param_dtype)
        ls2 = self.param("layer_scale2",
                         nn.initializers.constant(c.layerscale_value),
                         (c.hidden_size,), self.param_dtype)
        h = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + Dinov2Attention(c, self.dtype, self.param_dtype,
                                name="attention")(h) * ls1.astype(self.dtype)
        h = ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        x = x + Dinov2MLP(c, self.dtype, self.param_dtype,
                          name="mlp")(h) * ls2.astype(self.dtype)
        return x


class Dinov2Backbone(nn.Module):
    """(B, H, W, 3) -> list of (B, 1+hw, C) hidden states at out_indices,
    each passed through the final backbone LayerNorm (apply_layernorm=True,
    the DepthAnything configuration)."""

    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        c = self.cfg
        b, h, w, _ = pixels.shape
        ph, pw = h // c.patch_size, w // c.patch_size
        patches = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embeddings",
        )(pixels).reshape(b, ph * pw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.hidden_size), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size)),
             patches], axis=1)

        grid = c.image_size // c.patch_size
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (1, grid * grid + 1, c.hidden_size), self.param_dtype)
        x = x + interpolate_pos_encoding(pos.astype(jnp.float32), grid, ph,
                                         pw).astype(self.dtype)

        final_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                                param_dtype=self.param_dtype, name="layernorm")
        # stash every requested stage, then emit one feature per out_index IN
        # ORDER (duplicates allowed -- a set here would silently shrink the
        # DPT pyramid below len(out_channels))
        want = set(c.out_indices)
        stash = {}
        if 0 in want:  # embeddings count as stage 0
            stash[0] = x
        for i in range(c.num_hidden_layers):
            x = Dinov2Layer(c, self.dtype, self.param_dtype,
                            name=f"layer_{i}")(x)
            if (i + 1) in want:
                stash[i + 1] = x
        feats = [final_ln(stash[i].astype(jnp.float32)).astype(self.dtype)
                 for i in c.out_indices]
        return feats, (ph, pw)


def interpolate_pos_encoding(pos: jnp.ndarray, grid: int, ph: int,
                             pw: int) -> jnp.ndarray:
    """Bicubic-resize the (1, grid*grid+1, C) table to (1, ph*pw+1, C)
    (torch Dinov2Embeddings.interpolate_pos_encoding)."""
    if ph == grid and pw == grid:
        return pos
    cls, patch = pos[:, :1], pos[:, 1:]
    c = pos.shape[-1]
    patch = patch.reshape(1, grid, grid, c)
    patch = jax.image.resize(patch, (1, ph, pw, c), method="bicubic")
    return jnp.concatenate([cls, patch.reshape(1, ph * pw, c)], axis=1)


# ---------------------------------------------------------------------------
# DPT neck + head (Depth Anything layout)
# ---------------------------------------------------------------------------


def _interp_bilinear(x: jnp.ndarray, hw: Tuple[int, int],
                     align_corners: bool) -> jnp.ndarray:
    """NHWC bilinear resize matching torch F.interpolate semantics
    (resize_linear operates on trailing axes -> go through NCHW)."""
    from trajectorycrafter_tpu.ops.resize import resize_linear

    x = jnp.moveaxis(x, -1, 1)
    x = resize_linear(x, hw, align_corners=align_corners)
    return jnp.moveaxis(x, 1, -1)


class PreActResidual(nn.Module):
    """relu-conv3x3-relu-conv3x3 + residual (DepthAnythingPreActResidualLayer)."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda n: nn.Conv(self.features, (3, 3), padding=1,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=n)
        h = conv("convolution1")(nn.relu(x))
        h = conv("convolution2")(nn.relu(h))
        return x + h


class FeatureFusionLayer(nn.Module):
    """Merge a skip feature into the running fused state, upsample 2x,
    project (DepthAnythingFeatureFusionLayer)."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        if residual is not None:
            if x.shape[1:3] != residual.shape[1:3]:
                residual = _interp_bilinear(residual, x.shape[1:3],
                                            align_corners=False)
            x = x + PreActResidual(self.features, self.dtype, self.param_dtype,
                                   name="residual_layer1")(residual)
        x = PreActResidual(self.features, self.dtype, self.param_dtype,
                           name="residual_layer2")(x)
        out_hw = size if size is not None else (x.shape[1] * 2, x.shape[2] * 2)
        x = _interp_bilinear(x, out_hw, align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="projection")(x)


def sinusoidal_frame_encoding(t: int, c: int) -> jnp.ndarray:
    """(t, c) interleaved sin/cos table: pe[:, 0::2]=sin, pe[:, 1::2]=cos --
    the AnimateDiff ``PositionalEncoding`` buffer layout (registered in the
    official checkpoint as ``pos_encoder.pe``; value-identical here, so the
    converter drops the stored buffer)."""
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, c, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / c))
    pe = jnp.zeros((t, c), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (c - 1) // 2 + 1]))
    return pe


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis at fixed spatial sites
    (AnimateDiff ``VersatileAttention`` in Temporal mode): tokens are the T
    frames of one spatial location, sinusoidal frame encoding added to the
    hidden states before q/k/v."""

    channels: int
    heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tok):  # (B*h*w, T, C)
        t, c = tok.shape[1], tok.shape[2]
        tok = tok + sinusoidal_frame_encoding(t, c).astype(tok.dtype)[None]
        hd = c // self.heads
        dense = lambda n, bias: nn.Dense(c, use_bias=bias, dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=n)
        q = dense("to_q", False)(tok).reshape(-1, t, self.heads, hd)
        k = dense("to_k", False)(tok).reshape(-1, t, self.heads, hd)
        v = dense("to_v", False)(tok).reshape(-1, t, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, t, c)
        return dense("to_out", True)(o)


class TemporalTransformerBlock(nn.Module):
    """AnimateDiff ``TemporalTransformerBlock``: N pre-norm temporal
    self-attention sublayers followed by a pre-norm GEGLU feed-forward."""

    channels: int
    heads: int = 8
    num_attention_blocks: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tok):  # (B*h*w, T, C)
        c = self.channels
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        for k in range(self.num_attention_blocks):
            s = ln(f"norms_{k}")(tok.astype(jnp.float32)).astype(self.dtype)
            tok = tok + TemporalAttention(
                c, self.heads, self.dtype, self.param_dtype,
                name=f"attention_blocks_{k}")(s)
        s = ln("ff_norm")(tok.astype(jnp.float32)).astype(self.dtype)
        # GEGLU feed-forward (diffusers FeedForward activation_fn="geglu"):
        # one projection to 2x inner, value * gelu(gate)
        gg = nn.Dense(8 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="ff_proj")(s)
        val, gate = jnp.split(gg, 2, axis=-1)
        ffo = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="ff_out")(val * jax.nn.gelu(gate, approximate=False))
        return tok + ffo


class TemporalModule(nn.Module):
    """VDA spatio-temporal motion module (Video Depth Anything, CVPR'25
    §3.1; AnimateDiff ``TemporalModule``/``TemporalTransformer3DModel`` --
    the structure the official checkpoint serializes under
    ``head.motion_modules.{i}.temporal_transformer``):

      GroupNorm(32) -> proj_in -> 1x TemporalTransformerBlock ->
      proj_out + residual.

    proj_out is zero-initialised (module starts as identity), matching the
    official ``zero_initialize=True``.
    """

    channels: int
    heads: int = 8
    num_attention_blocks: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        residual = x
        # official norm_num_groups=32; min() only engages at toy test scale
        g = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm")(
            x.reshape(b * t, h, w, c).astype(jnp.float32)).astype(self.dtype)
        tok = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_in")(g.reshape(b, t, h, w, c))
        # temporal token streams: (B*h*w, T, C)
        tok = tok.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        tok = TemporalTransformerBlock(
            c, self.heads, self.num_attention_blocks, self.dtype,
            self.param_dtype, name="blocks_0")(tok)
        tok = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_out")(tok)
        out = tok.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return out + residual


class DPTTemporalHead(nn.Module):
    """Reassemble + fusion + depth head with the official VDA motion-module
    placement (dpt_temporal.py ``DPTHeadTemporal``): modules 0/1 on the
    reassembled layer_3/layer_4 features (channels out_channels[2]/[3],
    before the neck convs), modules 2/3 on the two deepest fusion outputs
    (channels ``features``).  ``num_temporal_blocks`` gates how many of the
    four run (0 = single-image Depth Anything).

    Operates on per-frame feature maps; the batch axis is (B, T) flattened
    except inside the temporal modules.
    """

    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, bt_shape: Tuple[int, int], ph: int, pw: int):
        c = self.cfg
        b, t = bt_shape

        def temporal(i, x):
            vid = x.reshape(b, t, *x.shape[1:])
            vid = TemporalModule(vid.shape[-1], c.temporal_heads,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"temporal_{i}")(vid)
            return vid.reshape(b * t, *x.shape[1:])

        # 1. reassemble: (BT, 1+hw, C) -> (BT, h*f, w*f, out_channels[i])
        pre = []
        for i, (f, ch, factor) in enumerate(
                zip(feats, c.out_channels, c.reassemble_factors)):
            m = f[:, 1:].reshape(-1, ph, pw, f.shape[-1])
            m = nn.Conv(ch, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"reassemble_{i}_projection")(m)
            if factor > 1:
                k = int(factor)
                m = nn.ConvTranspose(ch, (k, k), strides=(k, k),
                                     padding="VALID", dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"reassemble_{i}_resize")(m)
            elif factor < 1:
                s = int(1.0 / factor)
                m = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"reassemble_{i}_resize")(m)
            pre.append(m)

        # temporal modules 0/1 on layer_3/layer_4 (official forward applies
        # them after reassemble, before the scratch.layerX_rn convs)
        if c.num_temporal_blocks > 0:
            pre[2] = temporal(0, pre[2])
        if c.num_temporal_blocks > 1:
            pre[3] = temporal(1, pre[3])

        maps = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"neck_conv_{i}")(m)
            for i, m in enumerate(pre)
        ]

        # 2. fusion, deepest first (DepthAnythingFeatureFusionStage); motion
        # modules 2/3 follow the first two fusion stages (path_4, path_3)
        rev = maps[::-1]
        fused = None
        for i, m in enumerate(rev):
            size = rev[i + 1].shape[1:3] if i + 1 < len(rev) else None
            layer = FeatureFusionLayer(c.features, self.dtype,
                                       self.param_dtype, name=f"fusion_{i}")
            fused = layer(m, None, size) if fused is None else layer(fused, m, size)
            if i == 0 and c.num_temporal_blocks > 2:
                fused = temporal(2, fused)
            if i == 1 and c.num_temporal_blocks > 3:
                fused = temporal(3, fused)

        # 3. head (DepthAnythingDepthEstimationHead, relative type)
        x = nn.Conv(c.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head_conv1")(fused)
        x = _interp_bilinear(x, (ph * c.patch_size, pw * c.patch_size),
                             align_corners=True)
        x = nn.Conv(c.head_hidden_size, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype,
                    name="head_conv3")(x)
        return nn.relu(x)[..., 0]  # (BT, H, W) inverse depth


class VideoDepthAnything(nn.Module):
    """(B, T, H, W, 3) ImageNet-normalised frames -> (B, T, H, W) inverse
    (relative) depth.  H and W must be multiples of ``cfg.patch_size``."""

    cfg: VDAConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t, h, w, _ = frames.shape
        flat = frames.reshape(b * t, h, w, 3).astype(self.dtype)
        feats, (ph, pw) = Dinov2Backbone(c, self.dtype, self.param_dtype,
                                         name="backbone")(flat)
        depth = DPTTemporalHead(c, self.dtype, self.param_dtype, name="head")(
            feats, (b, t), ph, pw)
        return depth.reshape(b, t, h, w)


def infer_video_depth(
    model: "VideoDepthAnything",
    params,
    frames_im: jnp.ndarray,  # (F, H, W, 3) ImageNet-normalised
    window: int = 32,
    overlap: int = 10,
) -> jnp.ndarray:
    """Windowed inverse-depth inference for arbitrary-length videos
    (reference consistent_depth.py:43-47 INFER_LEN=32 / OVERLAP=10).

    Each later window is scale/shift-aligned to the previous result on the
    shared overlap frames (closed-form least squares) and ramp-blended across
    the overlap, keeping the relative depth scale consistent through the
    video -- the public Video-Depth-Anything chaining scheme.
    """
    from trajectorycrafter_tpu.depth_alignment import compute_scale_and_shift

    f = frames_im.shape[0]
    window = min(window, f)
    stride = max(window - overlap, 1)
    starts = list(range(0, max(f - window, 0) + 1, stride))
    if starts[-1] + window < f:
        starts.append(f - window)

    out = jnp.zeros((f,) + frames_im.shape[1:3], jnp.float32)
    fwd = lambda p, x: _vda_forward(model, p, x)
    prev_start = None
    for s in starts:
        d = fwd(params, frames_im[s : s + window]).astype(jnp.float32)
        ov = 0
        if prev_start is not None:
            ov = min(max(prev_start + window - s, 0), window)
        if ov > 0:
            scale, shift = compute_scale_and_shift(
                d[:ov].reshape(1, -1), out[s : s + ov].reshape(1, -1),
                jnp.ones((1, ov * d.shape[1] * d.shape[2])))
            d = d * scale[0] + shift[0]
            w = jnp.linspace(0.0, 1.0, ov)[:, None, None]
            d = d.at[:ov].set(d[:ov] * w + out[s : s + ov] * (1.0 - w))
        out = out.at[s : s + window].set(d)
        prev_start = s
    return out


@partial(jax.jit, static_argnames=("model",))
def _vda_forward(model, params, frames):
    """Shared jitted single-clip forward -- module-level so repeated
    windows/segments hit the jit cache instead of recompiling per call."""
    return model.apply({"params": params}, frames[None])[0]


def normalize_imagenet(frames01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalised (consistent_depth.py:219)."""
    mean = jnp.asarray(IMAGENET_MEAN, frames01.dtype)
    std = jnp.asarray(IMAGENET_STD, frames01.dtype)
    return (frames01 - mean) / std


def denormalize_imagenet(frames_im: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_imagenet` (consistent_depth.py:237-257)."""
    mean = jnp.asarray(IMAGENET_MEAN, frames_im.dtype)
    std = jnp.asarray(IMAGENET_STD, frames_im.dtype)
    return frames_im * std + mean
