"""DepthCrafter video-depth UNet (SVD spatio-temporal architecture) in Flax.

The reference wraps the external DepthCrafter submodule
(/root/reference/models/infer.py:9-10,20-31): an SVD-style
UNetSpatioTemporalConditionModel (diffusers architecture) fine-tuned for
video depth, driven through the SVD img2vid pipeline shell.  The submodule is
NOT vendored upstream, so this is a from-scratch Flax build of the published
SVD architecture:

  * 8-ch input (4 noisy latents + 4 per-frame conditioning latents);
  * blocks (320, 640, 1280, 1280), 2 layers/block, heads (5, 10, 20, 20),
    cross-attention to CLIP image embeddings (1024-d);
  * every layer = spatial resnet + temporal resnet blended by a learned
    alpha, plus spatial transformer + temporal transformer blended likewise;
  * time embedding 320 -> 1280 plus the 3 "added time ids"
    (fps, motion bucket, noise aug) embedded 256 -> 768 -> 1280.

Layout: frames ride the batch axis for spatial ops ((B*F, H, W, C)) and the
channel-last time axis for temporal ops -- XLA-friendly reshapes only.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.posemb import timestep_embedding


def _dense_cls(quant: str):
    """nn.Dense, or Int8Dense under ``quant="int8"`` (same scheme as the
    DiT: per-output-channel int8 weights + dynamic per-token activations,
    ops/int8.py).  Only the transformer GEMMs route through this -- the
    resnet convs and the tiny time/frame embeds stay bf16."""
    if quant == "int8":
        from trajectorycrafter_tpu.ops.int8 import Int8Dense

        return Int8Dense
    return nn.Dense


class AlphaBlender(nn.Module):
    """Learned scalar blend of spatial/temporal branches (SVD 'mix_factor').

    ``switch`` mirrors diffusers' ``switch_spatial_to_temporal_mix``: the
    sigmoid weight then lands on the TEMPORAL branch (used by the SVD
    temporal-decoder VAE blocks; the UNet blocks keep it on spatial)."""

    param_dtype: Any = jnp.float32
    switch: bool = False
    init: float = 0.5

    @nn.compact
    def __call__(self, spatial, temporal):
        mix = self.param("mix_factor", nn.initializers.constant(self.init),
                         (1,), self.param_dtype)
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0].astype(spatial.dtype)
        if self.switch:
            alpha = 1.0 - alpha
        return alpha * spatial + (1.0 - alpha) * temporal


class ResnetBlock2D(nn.Module):
    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm1")(
            x.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm2")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Resnet over the time axis: conv3d kernel (3,1,1) (diffusers
    TemporalResnetBlock, eps 1e-6)."""

    out_channels: int
    eps: float = 1e-6
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        # x: (B, F, H, W, C)
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm1")(
            x.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, :, None, None, :]  # temb per (B, F)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm2")(
            h.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, num_frames: int):
        # x: (B*F, H, W, C); temb: (B*F, 1280)
        bf, hh, ww, _ = x.shape
        b = bf // num_frames
        h = ResnetBlock2D(self.out_channels, self.eps, self.groups, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="spatial_res_block")(x, temb)
        h5 = h.reshape(b, num_frames, hh, ww, self.out_channels)
        temb5 = temb.reshape(b, num_frames, -1) if temb is not None else None
        # diffusers SpatioTemporalResBlock: temporal_eps defaults to eps, so
        # the UNet's temporal resnets share the spatial 1e-5
        t5 = TemporalResnetBlock(self.out_channels, eps=self.eps,
                                 groups=self.groups,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="temporal_res_block")(h5, temb5)
        out = AlphaBlender(self.param_dtype, name="time_mixer")(h5, t5)
        return out.reshape(bf, hh, ww, self.out_channels)


class CrossAttention(nn.Module):
    heads: int
    head_dim: int
    out_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context=None):
        self_attn = context is None
        if context is None:
            context = x
        b, s, _ = x.shape
        inner = self.heads * self.head_dim
        # int8 only where the big token stream flows: q/out always, k/v only
        # for self-attention (cross-attn context is the 1-token CLIP
        # embedding -- no GEMM time to win, pure conditioning-accuracy risk)
        big = _dense_cls(self.quant)
        kv = big if self_attn else nn.Dense
        q = big(inner, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="to_q")(x)
        k = kv(inner, use_bias=False, dtype=self.dtype,
               param_dtype=self.param_dtype, name="to_k")(context)
        v = kv(inner, use_bias=False, dtype=self.dtype,
               param_dtype=self.param_dtype, name="to_v")(context)
        q = q.reshape(b, s, self.heads, self.head_dim)
        k = k.reshape(b, -1, self.heads, self.head_dim)
        v = v.reshape(b, -1, self.heads, self.head_dim)
        # dispatch through the shared attention layer: at the production
        # depth resolution (576x1024 -> 9216 spatial tokens x 49 frames) a
        # materialised score tensor is ~83 GB fp32, so long self-attention
        # must take a tiled flash path (the reference leans on xformers for
        # the same reason, models/infer.py:46).  NOT the DiT's fixed-bias
        # exp2 kernel -- that one is only exact for bounded (QK-normed)
        # scores and this UNet has no QK-norm.  The two-pass TRUE-max exp2
        # kernel (ops/pallas/flash_max.py) was built as the round-5 attempt
        # at the same MXU-offload structure for unbounded scores, and
        # measured at PARITY WITHIN NOISE at the production depth shape
        # (two chip runs 2026-08-21: stock 1.945/2.047 vs max-pass
        # 2.006/2.005 s/step, bench_stages.json) -- the extra QK^T pass
        # costs about what the running-max VPU work it removes saves at
        # d=64/Skv=9216, so there is no win to take.  The stock running-max
        # kernel stays the default (fewer passes, simpler); the max-pass
        # kernel remains selectable (TRAJCRAFTER_DEPTH_ATTN=flash_max, read
        # at trace time; bench_stages.py measures both every run).
        # Tiny/cross shapes stay on the XLA einsum.
        import os

        from trajectorycrafter_tpu.ops.attention import multi_head_attention

        s_kv = k.shape[1]
        on_tpu = jax.devices()[0].platform != "cpu"
        flash = os.environ.get("TRAJCRAFTER_DEPTH_ATTN", "flash_stock")
        impl = flash if (on_tpu and s * s_kv >= 1024 * 1024) else "xla"
        out = multi_head_attention(q, k, v, scale=self.head_dim**-0.5,
                                   impl=impl)
        return _dense_cls(self.quant)(
            self.out_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        dense = _dense_cls(self.quant)
        h = dense(2 * self.dim * self.mult, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="proj_in")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g, approximate=False)
        return dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """Spatial transformer block: self-attn, cross-attn (CLIP), GEGLU FF."""

    dim: int
    heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context):
        hd = self.dim // self.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        h = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CrossAttention(self.heads, hd, self.dim, self.dtype,
                               self.param_dtype, quant=self.quant,
                               name="attn1")(h)
        h = ln("norm2")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CrossAttention(self.heads, hd, self.dim, self.dtype,
                               self.param_dtype, quant=self.quant,
                               name="attn2")(h, context)
        h = ln("norm3")(x.astype(jnp.float32)).astype(x.dtype)
        return x + GEGLUFeedForward(self.dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    quant=self.quant, name="ff")(h)


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal transformer over the frame axis per spatial location."""

    dim: int
    heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context):
        # x: (B*HW, F, C); context: (B*HW, 1, Dc)
        hd = self.dim // self.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        h = ln("norm_in")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quant=self.quant, name="ff_in")(h)
        h = ln("norm1")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CrossAttention(self.heads, hd, self.dim, self.dtype,
                               self.param_dtype, quant=self.quant,
                               name="attn1")(h)
        h = ln("norm2")(x.astype(jnp.float32)).astype(x.dtype)
        x = x + CrossAttention(self.heads, hd, self.dim, self.dtype,
                               self.param_dtype, quant=self.quant,
                               name="attn2")(h, context)
        h = ln("norm3")(x.astype(jnp.float32)).astype(x.dtype)
        return x + GEGLUFeedForward(self.dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    quant=self.quant, name="ff")(h)


class TransformerSpatioTemporal(nn.Module):
    dim: int
    heads: int
    num_layers: int = 1
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        # x: (B*F, H, W, C); context: (B*F, 1, 1024) per-frame CLIP embedding
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm")(
            x.astype(jnp.float32)).astype(x.dtype)
        h = h.reshape(bf, hh * ww, c)
        h = _dense_cls(self.quant)(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj_in")(h)

        # temporal context: first frame's embedding per batch, tiled over pixels
        ctx_first = context.reshape(b, num_frames, *context.shape[1:])[:, 0]
        time_context = jnp.repeat(ctx_first, hh * ww, axis=0)  # (B*HW, 1, Dc)

        # per-frame positional embedding added before every temporal block
        # (diffusers TransformerSpatioTemporalModel time_proj/time_pos_embed:
        # sinusoid of the frame INDEX, in_channels -> 4x -> in_channels MLP)
        frame_ids = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), b)
        femb = timestep_embedding(frame_ids, c).astype(self.dtype)
        femb = nn.Dense(c * 4, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_pos_embed_linear_1")(femb)
        femb = nn.silu(femb)
        femb = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_pos_embed_linear_2")(femb)
        femb = femb[:, None, :]  # (B*F, 1, C) broadcast over spatial tokens

        for i in range(self.num_layers):
            h = BasicTransformerBlock(self.dim, self.heads, self.dtype,
                                      self.param_dtype, quant=self.quant,
                                      name=f"transformer_blocks_{i}")(h, context)
            # (B*F, HW, C) -> (B*HW, F, C)
            ht = (h + femb).reshape(b, num_frames, hh * ww, self.dim)
            ht = jnp.moveaxis(ht, 1, 2).reshape(b * hh * ww, num_frames, self.dim)
            ht = TemporalBasicTransformerBlock(
                self.dim, self.heads, self.dtype, self.param_dtype,
                quant=self.quant,
                name=f"temporal_transformer_blocks_{i}")(ht, time_context)
            ht = ht.reshape(b, hh * ww, num_frames, self.dim)
            ht = jnp.moveaxis(ht, 2, 1).reshape(bf, hh * ww, self.dim)
            h = AlphaBlender(self.param_dtype, name="time_mixer")(h, ht)

        h = _dense_cls(self.quant)(
            c, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj_out")(h)
        return residual + h.reshape(bf, hh, ww, c)


class UNetSpatioTemporalConditionModel(nn.Module):
    """SVD UNet; (B, F, H/8, W/8, 8) + t + CLIP context -> (B, F, H/8, W/8, 4)."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # "int8": transformer GEMMs (self-attn q/k/v/out, cross-attn q/out,
    # GEGLU FF, spatio-temporal proj_in/out) run on the int8 MXU; params
    # produced by ops.int8.quantize_depth_unet_params.  Resnet convs and
    # embeds stay in `dtype`.
    quant: str = "none"

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, h, w, 8)
        timestep: jnp.ndarray,  # (B,) possibly continuous (0.25 log sigma)
        encoder_hidden_states: jnp.ndarray,  # (B, F, 1, 1024) per-frame CLIP
        added_time_ids: jnp.ndarray,  # (B, 3)
    ) -> jnp.ndarray:
        b, f, hh, ww, _ = sample.shape
        ch0 = self.block_out_channels[0]
        tdim = ch0 * 4

        # time embedding (+ added ids), broadcast per frame
        t_freq = timestep_embedding(timestep, ch0).astype(self.dtype)
        temb = nn.Dense(tdim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_1")(t_freq)
        temb = nn.silu(temb)
        temb = nn.Dense(tdim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_2")(temb)
        add_freq = timestep_embedding(
            added_time_ids.reshape(-1), self.addition_time_embed_dim
        ).reshape(b, -1).astype(self.dtype)
        aemb = nn.Dense(tdim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="add_embedding_linear_1")(add_freq)
        aemb = nn.silu(aemb)
        aemb = nn.Dense(tdim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="add_embedding_linear_2")(aemb)
        temb = temb + aemb
        temb = jnp.repeat(temb, f, axis=0)  # (B*F, tdim)

        ctx = encoder_hidden_states.reshape(b * f, *encoder_hidden_states.shape[2:])
        x = sample.reshape(b * f, hh, ww, sample.shape[-1]).astype(self.dtype)
        x = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)

        # ---- down
        skips = [x]
        n = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            has_attn = i < n - 1  # last block has no cross-attention
            # diffusers quirk: CrossAttn blocks build their resnets with
            # eps=1e-6, the plain block and the mid block with 1e-5
            eps = 1e-6 if has_attn else 1e-5
            for j in range(self.layers_per_block):
                x = SpatioTemporalResBlock(ch, eps=eps,
                                           groups=self.norm_num_groups,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name=f"down_{i}_res_{j}")(x, temb, f)
                if has_attn:
                    x = TransformerSpatioTemporal(
                        ch, self.num_attention_heads[i], 1, self.norm_num_groups,
                        self.dtype, self.param_dtype, quant=self.quant,
                        name=f"down_{i}_attn_{j}")(x, ctx, f)
                skips.append(x)
            if i < n - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid
        ch = self.block_out_channels[-1]
        x = SpatioTemporalResBlock(ch, groups=self.norm_num_groups, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="mid_res_0")(x, temb, f)
        x = TransformerSpatioTemporal(ch, self.num_attention_heads[-1], 1,
                                      self.norm_num_groups, self.dtype,
                                      self.param_dtype, quant=self.quant,
                                      name="mid_attn")(x, ctx, f)
        x = SpatioTemporalResBlock(ch, groups=self.norm_num_groups, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="mid_res_1")(x, temb, f)

        # ---- up
        for i, ch in enumerate(reversed(self.block_out_channels)):
            block_idx = n - 1 - i
            has_attn = block_idx < n - 1
            eps = 1e-6 if has_attn else 1e-5  # same CrossAttn-block quirk
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = SpatioTemporalResBlock(ch, eps=eps,
                                           groups=self.norm_num_groups,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name=f"up_{i}_res_{j}")(x, temb, f)
                if has_attn:
                    x = TransformerSpatioTemporal(
                        ch, self.num_attention_heads[block_idx], 1,
                        self.norm_num_groups, self.dtype, self.param_dtype,
                        quant=self.quant,
                        name=f"up_{i}_attn_{j}")(x, ctx, f)
            if i < n - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="conv_norm_out")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_out")(x)
        return x.reshape(b, f, hh, ww, self.out_channels)
