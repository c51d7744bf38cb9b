"""Torch oracle for the DepthCrafter/SVD stack (test-only).

The reference's depth path (/root/reference/models/infer.py:9-31) loads the
diffusers ``UNetSpatioTemporalConditionModel`` (via the non-vendored
DepthCrafter submodule's thin subclass) and the SVD
``AutoencoderKLTemporalDecoder``.  Neither the submodule nor diffusers is
installed here, so — exactly like tests/diffusers_shim.py does for the
CogVideoX blocks — this module is a faithful transcription of those PUBLIC
diffusers building blocks: same ``state_dict()`` key names, same math.  It
ships no production code; it exists so models/depthcrafter.py,
models/svd_vae.py, utils/convert.py and pipelines/depth.py can be parity
-tested against *executed torch code* instead of the builder's own reading
(round-3 verdict item #1).

Transcribed surface (diffusers v0.25-era, the SVD release):
  * resnet.py: ResnetBlock2D, TemporalResnetBlock, SpatioTemporalResBlock,
    AlphaBlender, Downsample2D, Upsample2D
  * attention.py / attention_processor.py: Attention (sdpa processor subset),
    BasicTransformerBlock, TemporalBasicTransformerBlock (GEGLU FF)
  * transformers/transformer_temporal.py: TransformerSpatioTemporalModel
  * unets/unet_3d_blocks.py: DownBlockSpatioTemporal,
    CrossAttnDownBlockSpatioTemporal, UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal, CrossAttnUpBlockSpatioTemporal
  * unets/unet_spatio_temporal_condition.py: UNetSpatioTemporalConditionModel
    (with the DepthCrafter subclass's per-frame CLIP-context twist)
  * autoencoders/vae.py + autoencoder_kl_temporal_decoder.py: Encoder,
    MidBlockTemporalDecoder, UpBlockTemporalDecoder, TemporalDecoder,
    AutoencoderKLTemporalDecoder
plus a windowed DepthCrafter pipeline shell implementing the public
tencent/DepthCrafter chaining scheme over the shim EulerDiscreteScheduler.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

from diffusers_shim import (
    EulerDiscreteScheduler,
    FeedForward,
    TimestepEmbedding,
    Timesteps,
)


# ----------------------------------------------------------------------------
# resnet.py
# ----------------------------------------------------------------------------


class ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, groups=32):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps, affine=True)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1) if self.use_in_shortcut
            else None)

    def forward(self, input_tensor, temb):
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return input_tensor + hidden_states


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis; conv3d kernel (3,1,1).  diffusers hardcodes
    32 norm groups — parameterised here only so tiny test configs divide."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, groups=32):
        super().__init__()
        out_channels = out_channels or in_channels
        kernel_size = (3, 1, 1)
        padding = tuple(k // 2 for k in kernel_size)
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv3d(in_channels, out_channels, kernel_size,
                               padding=padding)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps, affine=True)
        self.conv2 = nn.Conv3d(out_channels, out_channels, kernel_size,
                               padding=padding)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = (
            nn.Conv3d(in_channels, out_channels, 1) if self.use_in_shortcut
            else None)

    def forward(self, input_tensor, temb):
        # input: (B, C, F, H, W); temb: (B, F, temb_channels)
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))
            temb = temb.permute(0, 2, 1)
            hidden_states = hidden_states + temb[:, :, :, None, None]
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return input_tensor + hidden_states


class AlphaBlender(nn.Module):
    def __init__(self, alpha: float, merge_strategy: str = "learned_with_images",
                 switch_spatial_to_temporal_mix: bool = False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        if merge_strategy == "fixed":
            self.register_buffer("mix_factor", torch.Tensor([alpha]))
        elif merge_strategy in ("learned", "learned_with_images"):
            self.register_parameter(
                "mix_factor", nn.Parameter(torch.Tensor([alpha])))
        else:
            raise ValueError(merge_strategy)

    def get_alpha(self, image_only_indicator, ndims: int):
        if self.merge_strategy == "fixed":
            alpha = self.mix_factor
        elif self.merge_strategy == "learned":
            alpha = torch.sigmoid(self.mix_factor)
        else:  # learned_with_images
            alpha = torch.where(
                image_only_indicator.bool(),
                torch.ones(1, 1, device=image_only_indicator.device),
                torch.sigmoid(self.mix_factor)[..., None],
            )
            if ndims == 5:
                alpha = alpha[:, None, :, None, None]
            elif ndims == 3:
                alpha = alpha.reshape(-1)[:, None, None]
            else:
                raise ValueError(f"unexpected ndims {ndims}")
        return alpha

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, temporal_eps=None, merge_factor=0.5,
                 merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False, groups=32):
        super().__init__()
        out_channels = out_channels or in_channels
        self.spatial_res_block = ResnetBlock2D(
            in_channels, out_channels, temb_channels=temb_channels, eps=eps,
            groups=groups)
        self.temporal_res_block = TemporalResnetBlock(
            out_channels, out_channels, temb_channels=temb_channels,
            eps=temporal_eps if temporal_eps is not None else eps,
            groups=groups)
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy=merge_strategy,
            switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix)

    def forward(self, hidden_states, temb=None, image_only_indicator=None):
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(hidden_states, temb)
        batch_frames, channels, height, width = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states_mix = (
            hidden_states[None, :]
            .reshape(batch_size, num_frames, channels, height, width)
            .permute(0, 2, 1, 3, 4))
        hidden_states = (
            hidden_states[None, :]
            .reshape(batch_size, num_frames, channels, height, width)
            .permute(0, 2, 1, 3, 4))
        if temb is not None:
            temb = temb.reshape(batch_size, num_frames, -1)
        hidden_states = self.temporal_res_block(hidden_states, temb)
        hidden_states = self.time_mixer(
            x_spatial=hidden_states_mix, x_temporal=hidden_states,
            image_only_indicator=image_only_indicator)
        return (hidden_states.permute(0, 2, 1, 3, 4)
                .reshape(batch_frames, channels, height, width))


class Downsample2D(nn.Module):
    def __init__(self, channels, out_channels=None, padding=1):
        super().__init__()
        out_channels = out_channels or channels
        self.padding = padding
        self.conv = nn.Conv2d(channels, out_channels, 3, stride=2,
                              padding=padding)

    def forward(self, hidden_states):
        if self.padding == 0:
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant",
                                  value=0)
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, out_channels=None):
        super().__init__()
        out_channels = out_channels or channels
        self.conv = nn.Conv2d(channels, out_channels, 3, padding=1)

    def forward(self, hidden_states):
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0,
                                      mode="nearest")
        return self.conv(hidden_states)


# ----------------------------------------------------------------------------
# attention (sdpa-processor subset used by the SVD blocks)
# ----------------------------------------------------------------------------


class Attention(nn.Module):
    def __init__(self, query_dim, heads=8, dim_head=64,
                 cross_attention_dim=None, bias=False, out_bias=True,
                 norm_num_groups=None, eps=1e-5, residual_connection=False):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head**-0.5
        self.residual_connection = residual_connection
        cross_attention_dim = cross_attention_dim or query_dim
        if norm_num_groups is not None:
            self.group_norm = nn.GroupNorm(norm_num_groups, query_dim,
                                           eps=eps, affine=True)
        else:
            self.group_norm = None
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim,
                                               bias=out_bias),
                                     nn.Dropout(0.0)])

    def forward(self, hidden_states, encoder_hidden_states=None):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, h, w = hidden_states.shape
            hidden_states = hidden_states.view(b, c, h * w).transpose(1, 2)
        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        query = self.to_q(hidden_states)
        key = self.to_k(encoder_hidden_states)
        value = self.to_v(encoder_hidden_states)
        batch, q_len, _ = query.shape
        head_dim = query.shape[-1] // self.heads
        query = query.view(batch, -1, self.heads, head_dim).transpose(1, 2)
        key = key.view(batch, -1, self.heads, head_dim).transpose(1, 2)
        value = value.view(batch, -1, self.heads, head_dim).transpose(1, 2)
        hidden_states = F.scaled_dot_product_attention(query, key, value)
        hidden_states = (hidden_states.transpose(1, 2)
                         .reshape(batch, q_len, self.heads * head_dim))
        hidden_states = self.to_out[0](hidden_states)
        hidden_states = self.to_out[1](hidden_states)
        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(b, c, h, w)
        if self.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states


class BasicTransformerBlock(nn.Module):
    """Spatial block: self-attn, cross-attn, GEGLU FF (diffusers subset the
    SVD transformer reaches: no ada norms, no only_cross_attention)."""

    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 cross_attention_dim=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads=num_attention_heads,
                               dim_head=attention_head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads=num_attention_heads,
                               dim_head=attention_head_dim,
                               cross_attention_dim=cross_attention_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim, activation_fn="geglu")

    def forward(self, hidden_states, encoder_hidden_states=None):
        hidden_states = self.attn1(self.norm1(hidden_states)) + hidden_states
        hidden_states = self.attn2(
            self.norm2(hidden_states),
            encoder_hidden_states=encoder_hidden_states) + hidden_states
        hidden_states = self.ff(self.norm3(hidden_states)) + hidden_states
        return hidden_states


class TemporalBasicTransformerBlock(nn.Module):
    def __init__(self, dim, time_mix_inner_dim, num_attention_heads,
                 attention_head_dim, cross_attention_dim=None):
        super().__init__()
        self.is_res = dim == time_mix_inner_dim
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = FeedForward(dim, dim_out=time_mix_inner_dim,
                                 activation_fn="geglu")
        self.norm1 = nn.LayerNorm(time_mix_inner_dim)
        self.attn1 = Attention(time_mix_inner_dim, heads=num_attention_heads,
                               dim_head=attention_head_dim)
        if cross_attention_dim is not None:
            self.norm2 = nn.LayerNorm(time_mix_inner_dim)
            self.attn2 = Attention(time_mix_inner_dim,
                                   heads=num_attention_heads,
                                   dim_head=attention_head_dim,
                                   cross_attention_dim=cross_attention_dim)
        else:
            self.norm2 = None
            self.attn2 = None
        self.norm3 = nn.LayerNorm(time_mix_inner_dim)
        self.ff = FeedForward(time_mix_inner_dim, activation_fn="geglu")

    def forward(self, hidden_states, num_frames, encoder_hidden_states=None):
        batch_frames, seq_length, channels = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states = hidden_states[None, :].reshape(
            batch_size, num_frames, seq_length, channels)
        hidden_states = hidden_states.permute(0, 2, 1, 3)
        hidden_states = hidden_states.reshape(
            batch_size * seq_length, num_frames, channels)
        residual = hidden_states
        hidden_states = self.norm_in(hidden_states)
        hidden_states = self.ff_in(hidden_states)
        if self.is_res:
            hidden_states = hidden_states + residual
        norm_hidden_states = self.norm1(hidden_states)
        hidden_states = self.attn1(norm_hidden_states) + hidden_states
        if self.attn2 is not None:
            norm_hidden_states = self.norm2(hidden_states)
            hidden_states = self.attn2(
                norm_hidden_states,
                encoder_hidden_states=encoder_hidden_states) + hidden_states
        norm_hidden_states = self.norm3(hidden_states)
        ff_output = self.ff(norm_hidden_states)
        if self.is_res:
            hidden_states = ff_output + hidden_states
        else:
            hidden_states = ff_output
        hidden_states = hidden_states[None, :].reshape(
            batch_size, seq_length, num_frames, channels)
        hidden_states = hidden_states.permute(0, 2, 1, 3)
        hidden_states = hidden_states.reshape(
            batch_size * num_frames, seq_length, channels)
        return hidden_states


class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, num_attention_heads=16, attention_head_dim=88,
                 in_channels=320, num_layers=1, cross_attention_dim=None,
                 norm_num_groups=32):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner_dim)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner_dim, num_attention_heads,
                                  attention_head_dim,
                                  cross_attention_dim=cross_attention_dim)
            for _ in range(num_layers)])
        time_mix_inner_dim = inner_dim
        self.temporal_transformer_blocks = nn.ModuleList([
            TemporalBasicTransformerBlock(
                inner_dim, time_mix_inner_dim, num_attention_heads,
                attention_head_dim, cross_attention_dim=cross_attention_dim)
            for _ in range(num_layers)])
        time_embed_dim = in_channels * 4
        self.time_pos_embed = TimestepEmbedding(in_channels, time_embed_dim,
                                                out_dim=in_channels)
        self.time_proj = Timesteps(in_channels, True, 0.0)
        self.time_mixer = AlphaBlender(alpha=0.5,
                                       merge_strategy="learned_with_images")
        self.proj_out = nn.Linear(inner_dim, in_channels)

    def forward(self, hidden_states, encoder_hidden_states=None,
                image_only_indicator=None):
        batch_frames, _, height, width = hidden_states.shape
        num_frames = image_only_indicator.shape[-1]
        batch_size = batch_frames // num_frames

        time_context = encoder_hidden_states
        time_context_first_timestep = time_context[None, :].reshape(
            batch_size, num_frames, -1, time_context.shape[-1])[:, 0]
        time_context = time_context_first_timestep[:, None].broadcast_to(
            batch_size, height * width, time_context.shape[-2],
            time_context.shape[-1])
        time_context = time_context.reshape(
            batch_size * height * width, -1, time_context.shape[-1])

        residual = hidden_states
        hidden_states = self.norm(hidden_states)
        inner_dim = hidden_states.shape[1]
        hidden_states = hidden_states.permute(0, 2, 3, 1).reshape(
            batch_frames, height * width, inner_dim)
        hidden_states = self.proj_in(hidden_states)

        num_frames_emb = torch.arange(num_frames,
                                      device=hidden_states.device)
        num_frames_emb = num_frames_emb.repeat(batch_size, 1).reshape(-1)
        t_emb = self.time_proj(num_frames_emb).to(hidden_states.dtype)
        emb = self.time_pos_embed(t_emb)[:, None, :]

        for block, temporal_block in zip(self.transformer_blocks,
                                         self.temporal_transformer_blocks):
            hidden_states = block(
                hidden_states, encoder_hidden_states=encoder_hidden_states)
            hidden_states_mix = hidden_states + emb
            hidden_states_mix = temporal_block(
                hidden_states_mix, num_frames=num_frames,
                encoder_hidden_states=time_context)
            hidden_states = self.time_mixer(
                x_spatial=hidden_states, x_temporal=hidden_states_mix,
                image_only_indicator=image_only_indicator)

        hidden_states = self.proj_out(hidden_states)
        hidden_states = (hidden_states.reshape(batch_frames, height, width,
                                               inner_dim)
                         .permute(0, 3, 1, 2).contiguous())
        return hidden_states + residual


# ----------------------------------------------------------------------------
# unet_3d_blocks.py (SVD section)
# ----------------------------------------------------------------------------


class DownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 add_downsample=True, groups=32):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                in_ch, out_channels, temb_channels=temb_channels, eps=1e-5,
                groups=groups))
        self.resnets = nn.ModuleList(resnets)
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_channels, out_channels, padding=1)])
        else:
            self.downsamplers = None

    def forward(self, hidden_states, temb=None, image_only_indicator=None):
        output_states = ()
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb,
                                   image_only_indicator=image_only_indicator)
            output_states = output_states + (hidden_states,)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, num_attention_heads=1,
                 cross_attention_dim=1280, add_downsample=True, groups=32):
        super().__init__()
        resnets = []
        attentions = []
        self.has_cross_attention = True
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                in_ch, out_channels, temb_channels=temb_channels, eps=1e-6,
                groups=groups))
            attentions.append(TransformerSpatioTemporalModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels,
                num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=groups))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_channels, out_channels, padding=1)])
        else:
            self.downsamplers = None

    def forward(self, hidden_states, temb=None, encoder_hidden_states=None,
                image_only_indicator=None):
        output_states = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            hidden_states = resnet(hidden_states, temb,
                                   image_only_indicator=image_only_indicator)
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
            output_states = output_states + (hidden_states,)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class UNetMidBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, num_attention_heads=1,
                 cross_attention_dim=1280, groups=32):
        super().__init__()
        resnets = [SpatioTemporalResBlock(
            in_channels, in_channels, temb_channels=temb_channels, eps=1e-5,
            groups=groups)]
        attentions = []
        for _ in range(num_layers):
            attentions.append(TransformerSpatioTemporalModel(
                num_attention_heads, in_channels // num_attention_heads,
                in_channels=in_channels,
                num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=groups))
            resnets.append(SpatioTemporalResBlock(
                in_channels, in_channels, temb_channels=temb_channels,
                eps=1e-5, groups=groups))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)

    def forward(self, hidden_states, temb=None, encoder_hidden_states=None,
                image_only_indicator=None):
        hidden_states = self.resnets[0](
            hidden_states, temb, image_only_indicator=image_only_indicator)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
            hidden_states = resnet(hidden_states, temb,
                                   image_only_indicator=image_only_indicator)
        return hidden_states


class UpBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, num_layers=1, add_upsample=True, groups=32):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = (in_channels if (i == num_layers - 1)
                                 else out_channels)
            resnet_in_channels = (prev_output_channel if i == 0
                                  else out_channels)
            resnets.append(SpatioTemporalResBlock(
                resnet_in_channels + res_skip_channels, out_channels,
                temb_channels=temb_channels, eps=1e-5, groups=groups))
        self.resnets = nn.ModuleList(resnets)
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_channels,
                                                        out_channels)])
        else:
            self.upsamplers = None

    def forward(self, hidden_states, res_hidden_states_tuple, temb=None,
                image_only_indicator=None):
        for resnet in self.resnets:
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states],
                                      dim=1)
            hidden_states = resnet(hidden_states, temb,
                                   image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, prev_output_channel,
                 temb_channels, num_layers=1, transformer_layers_per_block=1,
                 num_attention_heads=1, cross_attention_dim=1280,
                 add_upsample=True, groups=32):
        super().__init__()
        resnets = []
        attentions = []
        self.has_cross_attention = True
        for i in range(num_layers):
            res_skip_channels = (in_channels if (i == num_layers - 1)
                                 else out_channels)
            resnet_in_channels = (prev_output_channel if i == 0
                                  else out_channels)
            resnets.append(SpatioTemporalResBlock(
                resnet_in_channels + res_skip_channels, out_channels,
                temb_channels=temb_channels, eps=1e-6, groups=groups))
            attentions.append(TransformerSpatioTemporalModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels,
                num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=groups))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_channels,
                                                        out_channels)])
        else:
            self.upsamplers = None

    def forward(self, hidden_states, res_hidden_states_tuple, temb=None,
                encoder_hidden_states=None, image_only_indicator=None):
        for resnet, attn in zip(self.resnets, self.attentions):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states],
                                      dim=1)
            hidden_states = resnet(hidden_states, temb,
                                   image_only_indicator=image_only_indicator)
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


# ----------------------------------------------------------------------------
# unet_spatio_temporal_condition.py
# ----------------------------------------------------------------------------


class UNetSpatioTemporalConditionModel(nn.Module):
    """SVD UNet with the DepthCrafter subclass's forward twist: per-frame
    CLIP context (B, F, 1, D) is flattened rather than repeat_interleaved
    from a single (B, 1, D) embedding."""

    def __init__(self, in_channels=8, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, num_attention_heads=(5, 10, 20, 20),
                 cross_attention_dim=1024, addition_time_embed_dim=256,
                 projection_class_embeddings_input_dim=768, groups=32):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        time_embed_dim = block_out_channels[0] * 4
        self.time_proj = Timesteps(block_out_channels[0], True,
                                   downscale_freq_shift=0)
        self.time_embedding = TimestepEmbedding(block_out_channels[0],
                                                time_embed_dim)
        self.add_time_proj = Timesteps(addition_time_embed_dim, True,
                                       downscale_freq_shift=0)
        self.add_embedding = TimestepEmbedding(
            projection_class_embeddings_input_dim, time_embed_dim)

        self.down_blocks = nn.ModuleList([])
        self.up_blocks = nn.ModuleList([])
        n = len(block_out_channels)
        output_channel = block_out_channels[0]
        for i in range(n):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n - 1
            if not is_final:
                self.down_blocks.append(CrossAttnDownBlockSpatioTemporal(
                    input_channel, output_channel, time_embed_dim,
                    num_layers=layers_per_block,
                    num_attention_heads=num_attention_heads[i],
                    cross_attention_dim=cross_attention_dim,
                    add_downsample=True, groups=groups))
            else:
                self.down_blocks.append(DownBlockSpatioTemporal(
                    input_channel, output_channel, time_embed_dim,
                    num_layers=layers_per_block, add_downsample=False,
                    groups=groups))

        self.mid_block = UNetMidBlockSpatioTemporal(
            block_out_channels[-1], temb_channels=time_embed_dim,
            num_attention_heads=num_attention_heads[-1],
            cross_attention_dim=cross_attention_dim, groups=groups)

        reversed_channels = list(reversed(block_out_channels))
        reversed_heads = list(reversed(num_attention_heads))
        output_channel = reversed_channels[0]
        for i in range(n):
            is_final = i == n - 1
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, n - 1)]
            if i == 0:
                self.up_blocks.append(UpBlockSpatioTemporal(
                    input_channel, prev_output_channel, output_channel,
                    time_embed_dim, num_layers=layers_per_block + 1,
                    add_upsample=not is_final, groups=groups))
            else:
                self.up_blocks.append(CrossAttnUpBlockSpatioTemporal(
                    input_channel, output_channel, prev_output_channel,
                    time_embed_dim, num_layers=layers_per_block + 1,
                    num_attention_heads=reversed_heads[i],
                    cross_attention_dim=cross_attention_dim,
                    add_upsample=not is_final, groups=groups))

        self.conv_norm_out = nn.GroupNorm(groups, block_out_channels[0],
                                          eps=1e-5)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids):
        # sample: (B, F, C, H, W); encoder_hidden_states: (B, F, 1, D)
        batch_size, num_frames = sample.shape[:2]
        timesteps = timestep.expand(batch_size)
        t_emb = self.time_proj(timesteps).to(sample.dtype)
        emb = self.time_embedding(t_emb)
        time_embeds = self.add_time_proj(added_time_ids.flatten())
        time_embeds = time_embeds.reshape((batch_size, -1)).to(emb.dtype)
        aug_emb = self.add_embedding(time_embeds)
        emb = emb + aug_emb

        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(num_frames, dim=0)
        encoder_hidden_states = encoder_hidden_states.flatten(0, 1)

        sample = self.conv_in(sample)
        image_only_indicator = torch.zeros(batch_size, num_frames,
                                           dtype=sample.dtype,
                                           device=sample.device)

        down_block_res_samples = (sample,)
        for downsample_block in self.down_blocks:
            if getattr(downsample_block, "has_cross_attention", False):
                sample, res_samples = downsample_block(
                    sample, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    image_only_indicator=image_only_indicator)
            else:
                sample, res_samples = downsample_block(
                    sample, temb=emb,
                    image_only_indicator=image_only_indicator)
            down_block_res_samples += res_samples

        sample = self.mid_block(
            sample, emb, encoder_hidden_states=encoder_hidden_states,
            image_only_indicator=image_only_indicator)

        for up_block in self.up_blocks:
            res_samples = down_block_res_samples[-len(up_block.resnets):]
            down_block_res_samples = (
                down_block_res_samples[:-len(up_block.resnets)])
            if getattr(up_block, "has_cross_attention", False):
                sample = up_block(
                    sample, res_hidden_states_tuple=res_samples, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    image_only_indicator=image_only_indicator)
            else:
                sample = up_block(
                    sample, res_hidden_states_tuple=res_samples, temb=emb,
                    image_only_indicator=image_only_indicator)

        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(sample)
        return sample.reshape(batch_size, num_frames, *sample.shape[1:])


# ----------------------------------------------------------------------------
# autoencoder_kl_temporal_decoder.py (+ vae.py Encoder)
# ----------------------------------------------------------------------------


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers=2,
                 add_downsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_ch, out_channels,
                                         temb_channels=None, eps=1e-6))
        self.resnets = nn.ModuleList(resnets)
        if add_downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_channels, out_channels, padding=0)])
        else:
            self.downsamplers = None

    def forward(self, hidden_states):
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, None)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
        return hidden_states


class UNetMidBlock2D(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels, in_channels, temb_channels=None,
                          eps=1e-6),
            ResnetBlock2D(in_channels, in_channels, temb_channels=None,
                          eps=1e-6)])
        self.attentions = nn.ModuleList([
            Attention(in_channels, heads=1, dim_head=in_channels, bias=True,
                      norm_num_groups=32, eps=1e-6, residual_connection=True)])

    def forward(self, hidden_states):
        hidden_states = self.resnets[0](hidden_states, None)
        hidden_states = self.attentions[0](hidden_states)
        hidden_states = self.resnets[1](hidden_states, None)
        return hidden_states


class Encoder(nn.Module):
    def __init__(self, in_channels=3, out_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 double_z=True):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 stride=1, padding=1)
        self.down_blocks = nn.ModuleList([])
        output_channel = block_out_channels[0]
        n = len(block_out_channels)
        for i in range(n):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            self.down_blocks.append(DownEncoderBlock2D(
                input_channel, output_channel, num_layers=layers_per_block,
                add_downsample=i < n - 1))
        self.mid_block = UNetMidBlock2D(block_out_channels[-1])
        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[-1],
                                          eps=1e-6)
        self.conv_act = nn.SiLU()
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.conv_out = nn.Conv2d(block_out_channels[-1], conv_out_channels,
                                  3, padding=1)

    def forward(self, sample):
        sample = self.conv_in(sample)
        for down_block in self.down_blocks:
            sample = down_block(sample)
        sample = self.mid_block(sample)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        return self.conv_out(sample)


class MidBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, attention_head_dim=512,
                 num_layers=1):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            input_channels = in_channels if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                input_channels, out_channels, temb_channels=None, eps=1e-6,
                temporal_eps=1e-5, merge_factor=0.0, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList([
            Attention(out_channels, heads=out_channels // attention_head_dim,
                      dim_head=attention_head_dim, bias=True,
                      norm_num_groups=32, eps=1e-6,
                      residual_connection=True)])

    def forward(self, hidden_states, image_only_indicator):
        hidden_states = self.resnets[0](
            hidden_states, image_only_indicator=image_only_indicator)
        for resnet, attn in zip(self.resnets[1:], self.attentions):
            hidden_states = attn(hidden_states)
            hidden_states = resnet(
                hidden_states, image_only_indicator=image_only_indicator)
        return hidden_states


class UpBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers=1,
                 add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            input_channels = in_channels if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                input_channels, out_channels, temb_channels=None, eps=1e-6,
                temporal_eps=1e-5, merge_factor=0.0, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True))
        self.resnets = nn.ModuleList(resnets)
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_channels,
                                                        out_channels)])
        else:
            self.upsamplers = None

    def forward(self, hidden_states, image_only_indicator):
        for resnet in self.resnets:
            hidden_states = resnet(
                hidden_states, image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


class TemporalDecoder(nn.Module):
    def __init__(self, in_channels=4, out_channels=3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        self.layers_per_block = layers_per_block
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[-1], 3,
                                 stride=1, padding=1)
        self.mid_block = MidBlockTemporalDecoder(
            block_out_channels[-1], block_out_channels[-1],
            attention_head_dim=block_out_channels[-1],
            num_layers=self.layers_per_block)
        self.up_blocks = nn.ModuleList([])
        reversed_channels = list(reversed(block_out_channels))
        output_channel = reversed_channels[0]
        n = len(block_out_channels)
        for i in range(n):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            self.up_blocks.append(UpBlockTemporalDecoder(
                prev_output_channel, output_channel,
                num_layers=self.layers_per_block + 1,
                add_upsample=i < n - 1))
        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[0], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)
        conv_out_kernel_size = (3, 1, 1)
        padding = tuple(k // 2 for k in conv_out_kernel_size)
        self.time_conv_out = nn.Conv3d(out_channels, out_channels,
                                       kernel_size=conv_out_kernel_size,
                                       padding=padding)

    def forward(self, sample, image_only_indicator, num_frames=1):
        sample = self.conv_in(sample)
        sample = self.mid_block(sample,
                                image_only_indicator=image_only_indicator)
        for up_block in self.up_blocks:
            sample = up_block(sample,
                              image_only_indicator=image_only_indicator)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(sample)
        batch_frames, channels, height, width = sample.shape
        batch_size = batch_frames // num_frames
        sample = (sample[None, :]
                  .reshape(batch_size, num_frames, channels, height, width)
                  .permute(0, 2, 1, 3, 4))
        sample = self.time_conv_out(sample)
        sample = (sample.permute(0, 2, 1, 3, 4)
                  .reshape(batch_frames, channels, height, width))
        return sample


class AutoencoderKLTemporalDecoder(nn.Module):
    """No post_quant_conv — the temporal-decoder variant drops it."""

    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 scaling_factor=0.18215):
        super().__init__()
        self.latent_channels = latent_channels
        self.scaling_factor = scaling_factor
        self.encoder = Encoder(in_channels=in_channels,
                               out_channels=latent_channels,
                               block_out_channels=block_out_channels,
                               layers_per_block=layers_per_block,
                               double_z=True)
        self.decoder = TemporalDecoder(in_channels=latent_channels,
                                       out_channels=out_channels,
                                       block_out_channels=block_out_channels,
                                       layers_per_block=layers_per_block)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)

    def encode_moments(self, x):
        """(BF, 3, H, W) -> (BF, 2*latent, H/8, W/8)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z, num_frames):
        """(BF, latent, h, w) -> (BF, 3, 8h, 8w)."""
        batch_size = z.shape[0] // num_frames
        image_only_indicator = torch.zeros(batch_size, num_frames,
                                           dtype=z.dtype, device=z.device)
        return self.decoder(z, image_only_indicator=image_only_indicator,
                            num_frames=num_frames)


# ----------------------------------------------------------------------------
# DepthCrafter windowed pipeline shell (tencent/DepthCrafter
# depth_crafter_ppl.py chaining scheme over the SVD EulerDiscrete config),
# consumed by the reference at models/infer.py:52-92.
# ----------------------------------------------------------------------------


def svd_euler_scheduler_torch() -> EulerDiscreteScheduler:
    return EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        prediction_type="v_prediction", interpolation_type="linear",
        use_karras_sigmas=True, sigma_min=0.002, sigma_max=700.0,
        timestep_type="continuous", timestep_spacing="leading",
        steps_offset=1)


@torch.no_grad()
def run_depthcrafter_pipeline_torch(unet, vae, frames, image_embeds,
                                    num_inference_steps, window_size, overlap,
                                    window_noises):
    """frames (F, H, W, 3) in [0,1]; image_embeds (F, 1, D);
    window_noises[i] = (win, h/8, w/8, latent) fp32 noise per window (shared
    with the JAX side for exact parity).  Returns raw (F, H, W) disparity."""
    frames = torch.from_numpy(frames).float()
    f = frames.shape[0]
    window_size = min(window_size, f)
    stride = max(window_size - overlap, 1)

    x = (frames * 2.0 - 1.0).permute(0, 3, 1, 2)  # (F, 3, H, W)
    moments = vae.encode_moments(x)  # (F, 8, h, w)
    cond_latents = moments[:, : vae.latent_channels]  # mode (mean), unscaled

    ctx = torch.from_numpy(image_embeds).float()  # (F, 1, D)
    added = torch.tensor([[6.0, 127.0, 0.02]])

    starts = list(range(0, max(f - window_size, 0) + 1, stride))
    if starts[-1] + window_size < f:
        starts.append(f - window_size)

    scheduler = svd_euler_scheduler_torch()
    latents_all = torch.zeros_like(cond_latents)
    prev_start = None
    for wi, s in enumerate(starts):
        noise = torch.from_numpy(window_noises[wi]).float().permute(0, 3, 1, 2)
        scheduler.set_timesteps(num_inference_steps)
        init = noise * scheduler.init_noise_sigma
        ov = 0
        if prev_start is not None:
            ov = min(max(prev_start + window_size - s, 0), window_size)
        if ov > 0:
            anchor = latents_all[s : s + ov]
            init = torch.cat(
                [anchor + noise[:ov] * scheduler.init_noise_sigma, init[ov:]],
                dim=0)
        lat = init
        win_cond = cond_latents[s : s + window_size]
        win_ctx = ctx[s : s + window_size]
        for t in scheduler.timesteps:
            scaled = scheduler.scale_model_input(lat, t)
            x_in = torch.cat([scaled, win_cond], dim=1)[None]  # (1,F,8,h,w)
            pred = unet(x_in, t[None], win_ctx[None], added)[0]
            lat = scheduler.step(pred, t, lat).prev_sample
        if ov > 0:
            w = torch.linspace(0.0, 1.0, ov)[:, None, None, None]
            blended = lat[:ov] * w + latents_all[s : s + ov] * (1.0 - w)
            lat = torch.cat([blended, lat[ov:]], dim=0)
        latents_all[s : s + lat.shape[0]] = lat
        prev_start = s

    dec = vae.decode(latents_all / vae.scaling_factor, num_frames=f)
    dec = (dec / 2.0 + 0.5).clamp(0.0, 1.0)
    return dec.mean(dim=1).numpy()  # (F, H, W)
