"""Minimal torch-side shim of the diffusers symbols the reference models import.

The reference's two flagship networks (crosstransformer3d.py,
autoencoder_magvit.py) are self-contained except for a handful of diffusers
building blocks.  diffusers itself is not installed here, so this module
re-implements exactly those symbols -- with the *same parameter names* (so
``state_dict()`` keys match the published checkpoints) and the *same math*
(so forward passes are the published forward passes).  Each class below is a
faithful transcription of the public diffusers implementation the reference
pins (the CogVideoX-era API: Attention with qk_norm="layer_norm",
CogVideoXAttnProcessor2_0, CogVideoXLayerNormZero, AdaLayerNorm with
output_dim/chunk_dim, CogVideoXDownsample3D/Upsample3D, ...).

Used by tests/test_reference_dit_parity.py / test_reference_vae_parity.py to
instantiate the reference's own CrossTransformer3DModel / AutoencoderKLCogVideoX
and check our Flax rebuild + utils/convert.py against them numerically.

install() registers the shim under ``sys.modules['diffusers'...]``; it is
idempotent and refuses to overwrite a real diffusers install.
"""

from __future__ import annotations

import functools
import inspect
import logging as _pylogging
import math
import sys
import types
from dataclasses import dataclass

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# ----------------------------------------------------------------------------
# configuration_utils
# ----------------------------------------------------------------------------


class ConfigMixin:
    """Captures decorated-__init__ kwargs into ``self.config`` (attribute
    access), mirroring diffusers' FrozenDict behaviour closely enough for the
    reference models (which read e.g. ``self.config.patch_size``)."""

    def register_to_config(self, **kwargs):
        internal = dict(getattr(self, "_internal_dict", {}))
        internal.update(kwargs)
        self._internal_dict = internal

    @property
    def config(self):
        return types.SimpleNamespace(**getattr(self, "_internal_dict", {}))


def register_to_config(init):
    @functools.wraps(init)
    def inner_init(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        # config is registered BEFORE init runs (as in diffusers), because
        # e.g. AutoencoderKLCogVideoX.__init__ reads self.config.block_out_channels
        self.register_to_config(**cfg)
        init(self, *args, **kwargs)

    return inner_init


# ----------------------------------------------------------------------------
# utils
# ----------------------------------------------------------------------------


def is_torch_version(operation: str, version: str) -> bool:
    # Only consumed by the reference's gradient-checkpointing branch; torch
    # here is always >= 1.11.
    return operation in (">=", ">")


def maybe_allow_in_graph(cls):
    return cls


def apply_forward_hook(fn):
    return fn


class _LoggingShim:
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers")


class FromOriginalModelMixin:
    pass


# ----------------------------------------------------------------------------
# modeling_utils / modeling_outputs
# ----------------------------------------------------------------------------


class ModelMixin(nn.Module):
    @property
    def device(self) -> torch.device:
        return next(self.parameters()).device

    @property
    def dtype(self) -> torch.dtype:
        return next(self.parameters()).dtype


class BaseOutput:
    """diffusers BaseOutput subset: field access by position (``out[0]``),
    as the reference pipeline does ``self.vae.encode(x)[0]``."""

    def __getitem__(self, i):
        return list(self.__dict__.values())[i]


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: torch.Tensor


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: "DiagonalGaussianDistribution"


@dataclass
class DecoderOutput(BaseOutput):
    sample: torch.Tensor


# ----------------------------------------------------------------------------
# activations
# ----------------------------------------------------------------------------


def get_activation(act_fn: str) -> nn.Module:
    act_fn = act_fn.lower()
    table = {"silu": nn.SiLU, "swish": nn.SiLU, "gelu": nn.GELU,
             "relu": nn.ReLU, "mish": nn.Mish}
    if act_fn not in table:
        raise ValueError(f"activation {act_fn!r} not supported by the shim")
    return table[act_fn]()


class GELU(nn.Module):
    """diffusers GELU wrapper: projection + gelu with selectable approximation."""

    def __init__(self, dim_in: int, dim_out: int, approximate: str = "none",
                 bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


# ----------------------------------------------------------------------------
# embeddings
# ----------------------------------------------------------------------------


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1, scale=1, max_period=10000):
    assert len(timesteps.shape) == 1, "Timesteps should be a 1d-array"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        start=0, end=half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool,
                 downscale_freq_shift: float, scale: int = 1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels, flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int,
                 act_fn: str = "silu", out_dim: int = None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = get_activation(act_fn)
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample, condition=None):
        sample = self.linear_1(sample)
        sample = self.act(sample)
        sample = self.linear_2(sample)
        return sample


def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be divisible by 2")
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim, grid):
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be divisible by 2")
    # grid[0] holds the meshgrid's first output ("w goes first" in diffusers)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_3d_sincos_pos_embed(embed_dim, spatial_size, temporal_size,
                            spatial_interpolation_scale=1.0,
                            temporal_interpolation_scale=1.0):
    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4")
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    embed_dim_spatial = 3 * embed_dim // 4
    embed_dim_temporal = embed_dim // 4

    grid_h = np.arange(spatial_size[1], dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # here w goes first
    grid = np.stack(grid, axis=0)
    grid = grid.reshape([2, 1, spatial_size[1], spatial_size[0]])
    pos_embed_spatial = get_2d_sincos_pos_embed_from_grid(embed_dim_spatial, grid)

    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    pos_embed_temporal = get_1d_sincos_pos_embed_from_grid(embed_dim_temporal, grid_t)

    pos_embed_spatial = pos_embed_spatial[np.newaxis, :, :]
    pos_embed_spatial = np.repeat(pos_embed_spatial, temporal_size, axis=0)
    pos_embed_temporal = pos_embed_temporal[:, np.newaxis, :]
    pos_embed_temporal = np.repeat(
        pos_embed_temporal, spatial_size[0] * spatial_size[1], axis=1)
    return np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)


def apply_rotary_emb(x, freqs_cis, use_real: bool = True,
                     use_real_unbind_dim: int = -1):
    """CogVideoX/flux-style rotary application on (B, H, S, D)."""
    cos, sin = freqs_cis  # (S, D)
    cos = cos[None, None].to(x.device)
    sin = sin[None, None].to(x.device)
    if use_real_unbind_dim == -1:
        x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
        x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    elif use_real_unbind_dim == -2:
        x_real, x_imag = x.reshape(*x.shape[:-1], 2, -1).unbind(-2)
        x_rotated = torch.cat([-x_imag, x_real], dim=-1)
    else:
        raise ValueError(f"use_real_unbind_dim={use_real_unbind_dim}")
    return (x.float() * cos + x_rotated.float() * sin).to(x.dtype)


# ----------------------------------------------------------------------------
# attention / attention_processor
# ----------------------------------------------------------------------------


class AttentionProcessor:  # typing marker in diffusers
    pass


class CogVideoXAttnProcessor2_0:
    """Joint text+video attention: concat [text; video], qkv, per-head QK
    layernorm, RoPE on the video slice, SDPA, out proj, split back."""

    def __call__(self, attn, hidden_states, encoder_hidden_states,
                 attention_mask=None, image_rotary_emb=None):
        text_seq_length = encoder_hidden_states.size(1)
        hidden_states = torch.cat([encoder_hidden_states, hidden_states], dim=1)
        batch_size, sequence_length, _ = hidden_states.shape

        query = attn.to_q(hidden_states)
        key = attn.to_k(hidden_states)
        value = attn.to_v(hidden_states)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)

        if attn.norm_q is not None:
            query = attn.norm_q(query)
        if attn.norm_k is not None:
            key = attn.norm_k(key)

        if image_rotary_emb is not None:
            query[:, :, text_seq_length:] = apply_rotary_emb(
                query[:, :, text_seq_length:], image_rotary_emb)
            if not attn.is_cross_attention:
                key[:, :, text_seq_length:] = apply_rotary_emb(
                    key[:, :, text_seq_length:], image_rotary_emb)

        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False)
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim)

        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)

        encoder_hidden_states, hidden_states = hidden_states.split(
            [text_seq_length, hidden_states.size(1) - text_seq_length], dim=1)
        return hidden_states, encoder_hidden_states


class FusedCogVideoXAttnProcessor2_0(CogVideoXAttnProcessor2_0):
    """Imported by the reference for fuse_qkv_projections; never exercised."""

    def __call__(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError("fused qkv path not shimmed")


class Attention(nn.Module):
    """Subset of diffusers Attention used by the reference (self-attention
    with optional per-head QK layernorm, external processor)."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, qk_norm=None,
                 eps=1e-5, out_bias=True, out_dim=None, processor=None):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (
            cross_attention_dim if cross_attention_dim is not None else query_dim)
        self.heads = heads
        self.is_cross_attention = cross_attention_dim is not None

        if qk_norm is None:
            self.norm_q = None
            self.norm_k = None
        elif qk_norm == "layer_norm":
            self.norm_q = nn.LayerNorm(dim_head, eps=eps)
            self.norm_k = nn.LayerNorm(dim_head, eps=eps)
        else:
            raise ValueError(f"qk_norm {qk_norm!r} not supported by the shim")

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            nn.Linear(self.inner_dim, out_dim if out_dim is not None else query_dim,
                      bias=out_bias),
            nn.Dropout(dropout),
        ])
        self.processor = processor if processor is not None else CogVideoXAttnProcessor2_0()

    def get_processor(self):
        return self.processor

    def set_processor(self, processor):
        self.processor = processor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(
            self, hidden_states, encoder_hidden_states=encoder_hidden_states,
            attention_mask=attention_mask, **cross_attention_kwargs)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        if activation_fn == "gelu":
            act_fn = GELU(dim, inner_dim, bias=bias)
        elif activation_fn == "gelu-approximate":
            act_fn = GELU(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "geglu":
            act_fn = GEGLU(dim, inner_dim, bias=bias)
        else:
            raise ValueError(f"activation_fn {activation_fn!r} not supported by the shim")
        self.net = nn.ModuleList([act_fn, nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out, bias=bias)])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


# ----------------------------------------------------------------------------
# normalization
# ----------------------------------------------------------------------------


class AdaLayerNorm(nn.Module):
    def __init__(self, embedding_dim, num_embeddings=None, output_dim=None,
                 norm_elementwise_affine=False, norm_eps=1e-5, chunk_dim=0):
        super().__init__()
        self.chunk_dim = chunk_dim
        output_dim = output_dim or embedding_dim * 2
        if num_embeddings is not None:
            self.emb = nn.Embedding(num_embeddings, embedding_dim)
        else:
            self.emb = None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, output_dim)
        self.norm = nn.LayerNorm(output_dim // 2, norm_eps, norm_elementwise_affine)

    def forward(self, x, timestep=None, temb=None):
        if self.emb is not None:
            temb = self.emb(timestep)
        temb = self.linear(self.silu(temb))
        if self.chunk_dim == 1:
            # CogVideoX convention: (shift, scale), per-batch modulation
            shift, scale = temb.chunk(2, dim=1)
            shift = shift[:, None, :]
            scale = scale[:, None, :]
        else:
            scale, shift = temb.chunk(2, dim=0)
        return self.norm(x) * (1 + scale) + shift


class CogVideoXLayerNormZero(nn.Module):
    def __init__(self, conditioning_dim, embedding_dim,
                 elementwise_affine=True, eps=1e-5, bias=True):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_dim, 6 * embedding_dim, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, eps=eps,
                                 elementwise_affine=elementwise_affine)

    def forward(self, hidden_states, encoder_hidden_states, temb):
        shift, scale, gate, enc_shift, enc_scale, enc_gate = \
            self.linear(self.silu(temb)).chunk(6, dim=1)
        hidden_states = self.norm(hidden_states) * (1 + scale)[:, None, :] \
            + shift[:, None, :]
        encoder_hidden_states = self.norm(encoder_hidden_states) \
            * (1 + enc_scale)[:, None, :] + enc_shift[:, None, :]
        return (hidden_states, encoder_hidden_states,
                gate[:, None, :], enc_gate[:, None, :])


# ----------------------------------------------------------------------------
# downsampling / upsampling (CogVideoX VAE)
# ----------------------------------------------------------------------------


class CogVideoXDownsample3D(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=2,
                 padding=0, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels,
                              kernel_size=kernel_size, stride=stride,
                              padding=padding)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            batch_size, channels, frames, height, width = x.shape
            x = x.permute(0, 3, 4, 1, 2).reshape(
                batch_size * height * width, channels, frames)
            if x.shape[-1] % 2 == 1:
                x_first, x_rest = x[..., 0], x[..., 1:]
                if x_rest.shape[-1] > 0:
                    x_rest = F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                x = torch.cat([x_first[..., None], x_rest], dim=-1)
            else:
                x = F.avg_pool1d(x, kernel_size=2, stride=2)
            x = x.reshape(batch_size, height, width, channels,
                          x.shape[-1]).permute(0, 3, 4, 1, 2)

        # asymmetric (right/bottom) spatial pad, then strided 2D conv per frame
        x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        batch_size, channels, frames, height, width = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(
            batch_size * frames, channels, height, width)
        x = self.conv(x)
        x = x.reshape(batch_size, frames, x.shape[1], x.shape[2],
                      x.shape[3]).permute(0, 2, 1, 3, 4)
        return x


class CogVideoXUpsample3D(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=1, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels,
                              kernel_size=kernel_size, stride=stride,
                              padding=padding)
        self.compress_time = compress_time

    def forward(self, inputs):
        if self.compress_time:
            if inputs.shape[2] > 1 and inputs.shape[2] % 2 == 1:
                # split first frame: spatial-only upsample, rest t+h+w
                x_first, x_rest = inputs[:, :, 0], inputs[:, :, 1:]
                x_first = F.interpolate(x_first, scale_factor=2.0)
                x_rest = F.interpolate(x_rest, scale_factor=2.0)
                x_first = x_first[:, :, None, :, :]
                inputs = torch.cat([x_first, x_rest], dim=2)
            elif inputs.shape[2] > 1:
                inputs = F.interpolate(inputs, scale_factor=2.0)
            else:
                inputs = inputs.squeeze(2)
                inputs = F.interpolate(inputs, scale_factor=2.0)
                inputs = inputs[:, :, None, :, :]
        else:
            b, c, t, h, w = inputs.shape
            inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            inputs = F.interpolate(inputs, scale_factor=2.0)
            inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(0, 2, 1, 3, 4)

        b, c, t, h, w = inputs.shape
        inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        inputs = self.conv(inputs)
        inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(0, 2, 1, 3, 4)
        return inputs


# ----------------------------------------------------------------------------
# autoencoders.vae
# ----------------------------------------------------------------------------


class DiagonalGaussianDistribution:
    def __init__(self, parameters: torch.Tensor, deterministic: bool = False):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = torch.exp(0.5 * self.logvar)
        self.var = torch.exp(self.logvar)
        if self.deterministic:
            self.var = self.std = torch.zeros_like(self.mean)

    def sample(self, generator=None) -> torch.Tensor:
        noise = torch.randn(self.mean.shape, generator=generator,
                            dtype=self.parameters.dtype,
                            device=self.parameters.device)
        return self.mean + self.std * noise

    def mode(self) -> torch.Tensor:
        return self.mean


# ----------------------------------------------------------------------------
# pipeline-level symbols (for executing the reference's
# pipeline_trajectorycrafter.py itself -- tests/test_reference_pipeline_parity)
# ----------------------------------------------------------------------------


class PipelineCallback:
    tensor_inputs: list = []


class MultiPipelineCallbacks:
    tensor_inputs: list = []


def replace_example_docstring(example_docstring):
    def decorator(fn):
        return fn

    return decorator


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """diffusers.utils.torch_utils.randn_tensor subset (CPU path): a list of
    generators draws per-batch-element; a single generator draws one shot."""
    device = device or torch.device("cpu")
    if isinstance(generator, list):
        shape_1 = (1,) + tuple(shape[1:])
        latents = [
            torch.randn(shape_1, generator=generator[i], device="cpu", dtype=dtype)
            for i in range(shape[0])
        ]
        return torch.cat(latents, dim=0).to(device)
    return torch.randn(shape, generator=generator, device="cpu", dtype=dtype).to(device)


def get_1d_rotary_pos_embed(dim, pos, theta=10000.0):
    """-> (cos, sin), each (len(pos), dim), pairs repeat-interleaved (the
    use_real=True, repeat_interleave_real=True branch diffusers uses here)."""
    freqs = 1.0 / (
        theta ** (torch.arange(0, dim, 2, dtype=torch.float64)[: dim // 2] / dim)
    )
    freqs = torch.outer(torch.from_numpy(np.asarray(pos)).float(), freqs.float())
    cos = freqs.cos().repeat_interleave(2, dim=1)
    sin = freqs.sin().repeat_interleave(2, dim=1)
    return cos, sin


def get_3d_rotary_pos_embed(
    embed_dim, crops_coords, grid_size, temporal_size, theta=10000, use_real=True
):
    """CogVideoX 3D RoPE: head channels t:h:w = 1/4 : 3/8 : 3/8, spatial grids
    cropped to the base resolution (diffusers get_3d_rotary_pos_embed)."""
    start, stop = crops_coords
    grid_size_h, grid_size_w = grid_size
    grid_h = np.linspace(
        start[0], stop[0], grid_size_h, endpoint=False, dtype=np.float32
    )
    grid_w = np.linspace(
        start[1], stop[1], grid_size_w, endpoint=False, dtype=np.float32
    )
    grid_t = np.linspace(0, temporal_size, temporal_size, endpoint=False,
                         dtype=np.float32)

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3
    freqs_t = get_1d_rotary_pos_embed(dim_t, grid_t, theta=theta)
    freqs_h = get_1d_rotary_pos_embed(dim_h, grid_h, theta=theta)
    freqs_w = get_1d_rotary_pos_embed(dim_w, grid_w, theta=theta)

    def combine(ft, fh, fw):
        ft = ft[:, None, None, :].expand(-1, grid_size_h, grid_size_w, -1)
        fh = fh[None, :, None, :].expand(temporal_size, -1, grid_size_w, -1)
        fw = fw[None, None, :, :].expand(temporal_size, grid_size_h, -1, -1)
        return torch.cat([ft, fh, fw], dim=-1).reshape(
            temporal_size * grid_size_h * grid_size_w, -1
        )

    cos = combine(freqs_t[0], freqs_h[0], freqs_w[0])
    sin = combine(freqs_t[1], freqs_h[1], freqs_w[1])
    return cos, sin


class DiffusionPipeline:
    """Minimal base: module registration, device/dtype, progress bar."""

    def __init__(self):
        pass

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    @property
    def _execution_device(self):
        return torch.device("cpu")

    @property
    def device(self):
        return torch.device("cpu")

    @property
    def dtype(self):
        transformer = getattr(self, "transformer", None)
        if transformer is not None:
            return transformer.dtype
        return torch.float32

    def progress_bar(self, total=None):
        class _Bar:
            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def update(self, n=1):
                pass

        return _Bar()

    def maybe_free_model_hooks(self):
        pass


def _rescale_zero_terminal_snr_abar(alphas_cumprod):
    """CogVideoX variant: operates on alphas_cumprod via sqrt-shift
    (Lin et al.; diffusers scheduling_ddim_cogvideox rescale_zero_terminal_snr)."""
    alphas_bar_sqrt = alphas_cumprod.sqrt()
    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].clone()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].clone()
    alphas_bar_sqrt -= alphas_bar_sqrt_T
    alphas_bar_sqrt *= alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)
    return alphas_bar_sqrt**2


class CogVideoXDDIMScheduler(ConfigMixin):
    """Transcription of diffusers' CogVideoXDDIMScheduler (the reference's
    'DDIM_Cog' sampler, demo.py:647-657): DDIM with the SNR-shifted
    alphas_cumprod and optional zero-terminal-SNR rescale."""

    order = 1
    _apply_snr_shift = True

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.0120,
        beta_schedule: str = "scaled_linear",
        trained_betas=None,
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        rescale_betas_zero_snr: bool = False,
        snr_shift_scale: float = 3.0,
    ):
        if beta_schedule == "linear":
            self.betas = torch.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=torch.float32
            )
        elif beta_schedule == "scaled_linear":
            self.betas = (
                torch.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps,
                    dtype=torch.float64,
                )
                ** 2
            )
        else:
            raise NotImplementedError(beta_schedule)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        if self._apply_snr_shift:  # SNR shift (CogVideoX)
            self.alphas_cumprod = self.alphas_cumprod / (
                snr_shift_scale + (1 - snr_shift_scale) * self.alphas_cumprod
            )
        if rescale_betas_zero_snr:
            self.alphas_cumprod = _rescale_zero_terminal_snr_abar(self.alphas_cumprod)
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.from_numpy(
            np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int64)
        )

    def _get_variance(self, timestep, prev_timestep):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (
            1 - alpha_prod_t / alpha_prod_t_prev
        )

    def scale_model_input(self, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps, device=None):
        self.num_inference_steps = num_inference_steps
        if self.config.timestep_spacing == "linspace":
            timesteps = (
                np.linspace(0, self.config.num_train_timesteps - 1, num_inference_steps)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // self.num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
            timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / self.num_inference_steps
            timesteps = np.round(
                np.arange(self.config.num_train_timesteps, 0, -step_ratio)
            ).astype(np.int64)
            timesteps -= 1
        else:
            raise ValueError(self.config.timestep_spacing)
        self.timesteps = torch.from_numpy(timesteps).to(device)

    def step(
        self,
        model_output,
        timestep,
        sample,
        eta: float = 0.0,
        use_clipped_model_output: bool = False,
        generator=None,
        variance_noise=None,
        return_dict: bool = True,
    ):
        if self.num_inference_steps is None:
            raise ValueError("call set_timesteps first")
        prev_timestep = (
            timestep - self.config.num_train_timesteps // self.num_inference_steps
        )
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t

        if self.config.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t ** (0.5) * model_output
            ) / alpha_prod_t ** (0.5)
            pred_epsilon = model_output
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output
            pred_epsilon = (
                sample - alpha_prod_t ** (0.5) * pred_original_sample
            ) / beta_prod_t ** (0.5)
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t**0.5) * sample - (
                beta_prod_t**0.5
            ) * model_output
            pred_epsilon = (alpha_prod_t**0.5) * model_output + (
                beta_prod_t**0.5
            ) * sample
        else:
            raise ValueError(self.config.prediction_type)

        variance = self._get_variance(timestep, prev_timestep)
        std_dev_t = eta * variance ** (0.5)

        if use_clipped_model_output:
            pred_epsilon = (
                sample - alpha_prod_t ** (0.5) * pred_original_sample
            ) / beta_prod_t ** (0.5)

        pred_sample_direction = (
            1 - alpha_prod_t_prev - std_dev_t**2
        ) ** (0.5) * pred_epsilon
        prev_sample = (
            alpha_prod_t_prev ** (0.5) * pred_original_sample + pred_sample_direction
        )

        if eta > 0:
            if variance_noise is None:
                variance_noise = randn_tensor(
                    model_output.shape,
                    generator=generator,
                    device=model_output.device,
                    dtype=model_output.dtype,
                )
            prev_sample = prev_sample + std_dev_t * variance_noise

        if not return_dict:
            return (prev_sample,)
        return types.SimpleNamespace(
            prev_sample=prev_sample, pred_original_sample=pred_original_sample
        )

    def add_noise(self, original_samples, noise, timesteps):
        alphas_cumprod = self.alphas_cumprod.to(
            device=original_samples.device, dtype=original_samples.dtype
        )
        timesteps = timesteps.to(original_samples.device)
        sqrt_alpha_prod = alphas_cumprod[timesteps] ** 0.5
        sqrt_alpha_prod = sqrt_alpha_prod.flatten()
        while len(sqrt_alpha_prod.shape) < len(original_samples.shape):
            sqrt_alpha_prod = sqrt_alpha_prod.unsqueeze(-1)
        sqrt_one_minus_alpha_prod = (1 - alphas_cumprod[timesteps]) ** 0.5
        sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.flatten()
        while len(sqrt_one_minus_alpha_prod.shape) < len(original_samples.shape):
            sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.unsqueeze(-1)
        return (
            sqrt_alpha_prod * original_samples
            + sqrt_one_minus_alpha_prod * noise
        )


class DDIMScheduler(CogVideoXDDIMScheduler):
    """Plain diffusers DDIMScheduler -- the reference CLI's DEFAULT sampler
    ('DDIM_Origin', inference.py:85-90): identical DDIM math but NO SNR
    shift.  (scheduling_ddim.py's rescale_zero_terminal_snr operates on
    betas, but the reconstructed alphas_cumprod equals the sqrt-shift on
    alphas_cumprod exactly, so the base implementation carries over.)"""

    _apply_snr_shift = False


def _rescale_zero_terminal_snr_betas(betas):
    """Betas-space zero-terminal-SNR rescale (scheduling_euler_discrete /
    scheduling_ddim rescale_zero_terminal_snr): shift sqrt(abar), then
    reconstruct betas."""
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    alphas_bar_sqrt = alphas_cumprod.sqrt()
    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].clone()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].clone()
    alphas_bar_sqrt -= alphas_bar_sqrt_T
    alphas_bar_sqrt *= alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)
    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = torch.cat([alphas_bar[0:1], alphas])
    return 1 - alphas


class EulerDiscreteScheduler(ConfigMixin):
    """Transcription of diffusers' EulerDiscreteScheduler, deterministic
    subset the reference's 'Euler' menu entry reaches (demo.py:648 with the
    checkpoint scheduler config): discrete timestep type, linear sigma
    interpolation, no karras, s_churn 0, final sigma zero."""

    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas=None,
        prediction_type: str = "epsilon",
        interpolation_type: str = "linear",
        use_karras_sigmas: bool = False,
        sigma_min=None,
        sigma_max=None,
        timestep_type: str = "discrete",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
    ):
        if beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = (
                torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps, dtype=torch.float32) ** 2
            )
        else:
            raise NotImplementedError(beta_schedule)
        if rescale_betas_zero_snr:
            betas = _rescale_zero_terminal_snr_betas(betas)
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        if rescale_betas_zero_snr:
            # close to 0 without being 0 so the first sigma is not inf
            self.alphas_cumprod[-1] = 2**-24

        sigmas = (((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5).flip(0)
        self.sigmas = torch.cat([sigmas, torch.zeros(1)])
        self.timesteps = torch.from_numpy(
            np.linspace(0, num_train_timesteps - 1, num_train_timesteps,
                        dtype=float)[::-1].copy()
        )
        self.num_inference_steps = None
        self._step_index = None
        self.is_scale_input_called = False

    @property
    def init_noise_sigma(self):
        max_sigma = max(self.sigmas)
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return max_sigma
        return (max_sigma**2 + 1) ** 0.5

    @property
    def step_index(self):
        return self._step_index

    def set_timesteps(self, num_inference_steps, device=None):
        self.num_inference_steps = num_inference_steps
        if self.config.timestep_spacing == "linspace":
            timesteps = np.linspace(
                0, self.config.num_train_timesteps - 1, num_inference_steps,
                dtype=np.float32)[::-1].copy()
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1].copy().astype(np.float32)
            )
            timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            timesteps = (
                np.arange(self.config.num_train_timesteps, 0, -step_ratio)
                .round().copy().astype(np.float32)
            )
            timesteps -= 1
        else:
            raise ValueError(self.config.timestep_spacing)

        sigmas = np.array(
            ((1 - self.alphas_cumprod.numpy()) / self.alphas_cumprod.numpy())
            ** 0.5)
        log_sigmas = np.log(sigmas)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        if self.config.use_karras_sigmas:
            # diffusers _convert_to_karras: config sigma bounds win when set
            sigma_min = (self.config.sigma_min if self.config.sigma_min
                         is not None else sigmas[-1].item())
            sigma_max = (self.config.sigma_max if self.config.sigma_max
                         is not None else sigmas[0].item())
            rho = 7.0
            ramp = np.linspace(0, 1, num_inference_steps)
            min_inv_rho = sigma_min ** (1 / rho)
            max_inv_rho = sigma_max ** (1 / rho)
            sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
            timesteps = np.array(
                [np.interp(np.log(s), log_sigmas, np.arange(len(log_sigmas)))
                 for s in sigmas])
        if (self.config.timestep_type == "continuous"
                and self.config.prediction_type == "v_prediction"):
            # SVD convention: the model is conditioned on 0.25 * log(sigma)
            self.timesteps = torch.tensor(
                [0.25 * float(np.log(s)) for s in sigmas],
                dtype=torch.float32).to(device)
        else:
            self.timesteps = torch.from_numpy(
                timesteps.astype(np.float32)).to(device)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self.sigmas = torch.from_numpy(sigmas).to(device)
        self._step_index = None

    def _init_step_index(self, timestep):
        indices = (self.timesteps == timestep).nonzero()
        pos = 1 if len(indices) > 1 else 0
        self._step_index = int(indices[pos].item())

    def scale_model_input(self, sample, timestep=None):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]
        self.is_scale_input_called = True
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, model_output, timestep, sample, s_churn: float = 0.0,
             s_tmin: float = 0.0, s_tmax: float = float("inf"),
             s_noise: float = 1.0, generator=None, return_dict: bool = True):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]
        gamma = (
            min(s_churn / (len(self.sigmas) - 1), 2**0.5 - 1)
            if s_tmin <= sigma <= s_tmax else 0.0
        )
        sigma_hat = sigma * (gamma + 1)
        if gamma > 0:
            noise = randn_tensor(model_output.shape, generator=generator,
                                 device=model_output.device,
                                 dtype=model_output.dtype)
            eps = noise * s_noise
            sample = sample + eps * (sigma_hat**2 - sigma**2) ** 0.5

        if self.config.prediction_type == "epsilon":
            pred_original_sample = sample - sigma_hat * model_output
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output * (
                -sigma / (sigma**2 + 1) ** 0.5) + (sample / (sigma**2 + 1))
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output
        else:
            raise ValueError(self.config.prediction_type)

        derivative = (sample - pred_original_sample) / sigma_hat
        dt = self.sigmas[self._step_index + 1] - sigma_hat
        prev_sample = sample + derivative * dt
        self._step_index += 1
        if not return_dict:
            return (prev_sample,)
        return types.SimpleNamespace(prev_sample=prev_sample,
                                     pred_original_sample=pred_original_sample)


class EulerAncestralDiscreteScheduler(EulerDiscreteScheduler):
    """Transcription of diffusers' EulerAncestralDiscreteScheduler ('Euler A',
    demo.py:649): the Euler schedule with a stochastic sigma_up/sigma_down
    ancestral split; noise drawn via randn_tensor with the pipeline generator
    (prepare_extra_step_kwargs passes it because step() accepts one)."""

    def step(self, model_output, timestep, sample, generator=None,
             return_dict: bool = True):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]

        if self.config.prediction_type == "epsilon":
            pred_original_sample = sample - sigma * model_output
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output * (
                -sigma / (sigma**2 + 1) ** 0.5) + (sample / (sigma**2 + 1))
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output
        else:
            raise ValueError(self.config.prediction_type)

        sigma_from = self.sigmas[self._step_index]
        sigma_to = self.sigmas[self._step_index + 1]
        sigma_up = (
            sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
        ) ** 0.5
        sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5

        derivative = (sample - pred_original_sample) / sigma
        dt = sigma_down - sigma
        prev_sample = sample + derivative * dt
        noise = randn_tensor(model_output.shape, generator=generator,
                             device=model_output.device,
                             dtype=model_output.dtype)
        prev_sample = prev_sample + noise * sigma_up
        self._step_index += 1
        if not return_dict:
            return (prev_sample,)
        return types.SimpleNamespace(prev_sample=prev_sample,
                                     pred_original_sample=pred_original_sample)


class DPMSolverMultistepScheduler(ConfigMixin):
    """Transcription of diffusers>=0.30 DPMSolverMultistepScheduler,
    deterministic subset the reference's 'DPM++' menu entry reaches
    (demo.py:650 + the CogVideoX-Fun checkpoint config): algorithm
    dpmsolver++, solver_order 2, midpoint, no karras/lu/exponential sigmas,
    thresholding off, final_sigmas_type 'zero'.  With 'zero' final sigmas
    the last step is always first-order (the `or final_sigmas_type=="zero"`
    leg of diffusers' lower_order_final)."""

    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas=None,
        solver_order: int = 2,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        use_karras_sigmas: bool = False,
        final_sigmas_type: str = "zero",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
    ):
        assert algorithm_type == "dpmsolver++" and solver_type == "midpoint"
        assert not thresholding and not use_karras_sigmas
        if beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = (
                torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps, dtype=torch.float32) ** 2
            )
        else:
            raise NotImplementedError(beta_schedule)
        if rescale_betas_zero_snr:
            betas = _rescale_zero_terminal_snr_betas(betas)
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        if rescale_betas_zero_snr:
            self.alphas_cumprod[-1] = 2**-24
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.arange(num_train_timesteps - 1, -1, -1)
        self._step_index = None

    @property
    def step_index(self):
        return self._step_index

    def set_timesteps(self, num_inference_steps, device=None):
        self.num_inference_steps = num_inference_steps
        if self.config.timestep_spacing == "linspace":
            timesteps = (
                np.linspace(0, self.config.num_train_timesteps - 1,
                            num_inference_steps + 1)
                .round()[::-1][:-1].copy().astype(np.int64)
            )
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // (num_inference_steps + 1)
            timesteps = (
                (np.arange(0, num_inference_steps + 1) * step_ratio)
                .round()[::-1][:-1].copy().astype(np.int64)
            )
            timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            timesteps = (
                np.arange(self.config.num_train_timesteps, 0, -step_ratio)
                .round().copy().astype(np.int64)
            )
            timesteps -= 1
        else:
            raise ValueError(self.config.timestep_spacing)

        sigmas = np.array(
            ((1 - self.alphas_cumprod.numpy()) / self.alphas_cumprod.numpy())
            ** 0.5)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        if self.config.final_sigmas_type == "zero":
            sigma_last = 0.0
        elif self.config.final_sigmas_type == "sigma_min":
            sigma_last = float(
                ((1 - self.alphas_cumprod[0]) / self.alphas_cumprod[0]) ** 0.5)
        else:
            raise ValueError(self.config.final_sigmas_type)
        self.sigmas = torch.from_numpy(
            np.concatenate([sigmas, [sigma_last]]).astype(np.float32))
        self.timesteps = torch.from_numpy(timesteps).to(torch.int64)
        self.model_outputs = [None] * self.config.solver_order
        self.lower_order_nums = 0
        self._step_index = None

    def _init_step_index(self, timestep):
        indices = (self.timesteps == timestep).nonzero()
        pos = 1 if len(indices) > 1 else 0
        self._step_index = int(indices[pos].item())

    def scale_model_input(self, sample, timestep=None):
        return sample

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
        sigma_t = sigma * alpha_t
        return alpha_t, sigma_t

    def convert_model_output(self, model_output, sample):
        """-> x0 prediction (dpmsolver++ data-prediction form)."""
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.config.prediction_type == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if self.config.prediction_type == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        if self.config.prediction_type == "sample":
            return model_output
        raise ValueError(self.config.prediction_type)

    def dpm_solver_first_order_update(self, model_output, sample):
        sigma_t, sigma_s = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s, sigma_s = self._sigma_to_alpha_sigma_t(sigma_s)
        lambda_t = torch.log(alpha_t) - torch.log(sigma_t)
        lambda_s = torch.log(alpha_s) - torch.log(sigma_s)
        h = lambda_t - lambda_s
        return (sigma_t / sigma_s) * sample - (
            alpha_t * (torch.exp(-h) - 1.0)) * model_output

    def multistep_dpm_solver_second_order_update(self, model_output_list, sample):
        sigma_t = self.sigmas[self.step_index + 1]
        sigma_s0 = self.sigmas[self.step_index]
        sigma_s1 = self.sigmas[self.step_index - 1]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)
        lambda_t = torch.log(alpha_t) - torch.log(sigma_t)
        lambda_s0 = torch.log(alpha_s0) - torch.log(sigma_s0)
        lambda_s1 = torch.log(alpha_s1) - torch.log(sigma_s1)
        m0, m1 = model_output_list[-1], model_output_list[-2]
        h, h_0 = lambda_t - lambda_s0, lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0, D1 = m0, (1.0 / r0) * (m0 - m1)
        # midpoint
        return (
            (sigma_t / sigma_s0) * sample
            - (alpha_t * (torch.exp(-h) - 1.0)) * D0
            - 0.5 * (alpha_t * (torch.exp(-h) - 1.0)) * D1
        )

    def step(self, model_output, timestep, sample, generator=None,
             return_dict: bool = True):
        if self._step_index is None:
            self._init_step_index(timestep)

        lower_order_final = (self.step_index == len(self.timesteps) - 1) and (
            self.config.euler_at_final
            or (self.config.lower_order_final and len(self.timesteps) < 15)
            or self.config.final_sigmas_type == "zero"
        )
        model_output = self.convert_model_output(model_output, sample=sample)
        for i in range(self.config.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output

        if self.config.solver_order == 1 or self.lower_order_nums < 1 or lower_order_final:
            prev_sample = self.dpm_solver_first_order_update(model_output, sample=sample)
        else:
            prev_sample = self.multistep_dpm_solver_second_order_update(
                self.model_outputs, sample=sample)

        if self.lower_order_nums < self.config.solver_order:
            self.lower_order_nums += 1
        self._step_index += 1
        if not return_dict:
            return (prev_sample,)
        return types.SimpleNamespace(prev_sample=prev_sample)

    def add_noise(self, original_samples, noise, timesteps):
        step_indices = [
            (self.timesteps == t).nonzero().item() for t in timesteps.reshape(-1)
        ]
        sigma = self.sigmas[step_indices].flatten()
        while len(sigma.shape) < len(original_samples.shape):
            sigma = sigma.unsqueeze(-1)
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        return alpha_t * original_samples + sigma_t * noise


class PNDMScheduler(ConfigMixin):
    """Transcription of diffusers' PNDMScheduler ('PNDM', demo.py:651).
    With the CogVideoX-Fun checkpoint config skip_prk_steps stays at the
    diffusers default False -> pseudo-RK4 warmup then 4th-order PLMS; the
    linear combinations act on raw model outputs with the v->epsilon
    conversion applied once inside _get_prev_sample."""

    order = 1
    pndm_order = 4

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas=None,
        skip_prk_steps: bool = False,
        set_alpha_to_one: bool = False,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
    ):
        if beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = (
                torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps, dtype=torch.float32) ** 2
            )
        else:
            raise NotImplementedError(beta_schedule)
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.cur_model_output = 0
        self.counter = 0
        self.cur_sample = None
        self.ets = []
        self.num_inference_steps = None
        self._timesteps = np.arange(0, num_train_timesteps)[::-1].copy()
        self.prk_timesteps = None
        self.plms_timesteps = None
        self.timesteps = None

    def set_timesteps(self, num_inference_steps, device=None):
        self.num_inference_steps = num_inference_steps
        if self.config.timestep_spacing == "linspace":
            self._timesteps = (
                np.linspace(0, self.config.num_train_timesteps - 1,
                            num_inference_steps).round().astype(np.int64)
            )
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // num_inference_steps
            self._timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round().astype(np.int64)
            )
            self._timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            self._timesteps = np.round(
                np.arange(self.config.num_train_timesteps, 0, -step_ratio)
            )[::-1].astype(np.int64)
            self._timesteps -= 1
        else:
            raise ValueError(self.config.timestep_spacing)

        if self.config.skip_prk_steps:
            self.prk_timesteps = np.array([])
            self.plms_timesteps = np.concatenate(
                [self._timesteps[:-1], self._timesteps[-2:-1],
                 self._timesteps[-1:]]
            )[::-1].copy()
        else:
            prk_timesteps = np.array(
                self._timesteps[-self.pndm_order:]
            ).repeat(2) + np.tile(
                np.array([0, self.config.num_train_timesteps
                          // num_inference_steps // 2]),
                self.pndm_order,
            )
            self.prk_timesteps = (prk_timesteps[:-1].repeat(2)[1:-1])[::-1].copy()
            self.plms_timesteps = self._timesteps[:-3][::-1].copy()

        timesteps = np.concatenate([self.prk_timesteps, self.plms_timesteps])
        self.timesteps = torch.from_numpy(timesteps).to(torch.int64)
        self.ets = []
        self.counter = 0
        self.cur_model_output = 0
        self.cur_sample = None

    def scale_model_input(self, sample, timestep=None):
        return sample

    def _get_prev_sample(self, sample, timestep, prev_timestep, model_output):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep] if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        if self.config.prediction_type == "v_prediction":
            model_output = (alpha_prod_t**0.5) * model_output + (
                beta_prod_t**0.5) * sample
        elif self.config.prediction_type != "epsilon":
            raise ValueError(self.config.prediction_type)
        sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
        model_output_denom_coeff = alpha_prod_t * beta_prod_t_prev ** 0.5 + (
            alpha_prod_t * beta_prod_t * alpha_prod_t_prev) ** 0.5
        return (
            sample_coeff * sample
            - (alpha_prod_t_prev - alpha_prod_t) * model_output
            / model_output_denom_coeff
        )

    def step_prk(self, model_output, timestep, sample):
        diff_to_prev = (
            0 if self.counter % 2 else
            self.config.num_train_timesteps // self.num_inference_steps // 2
        )
        prev_timestep = timestep - diff_to_prev
        timestep = self.prk_timesteps[self.counter // 4 * 4]
        if self.counter % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 6 * model_output
            self.ets.append(model_output)
            self.cur_sample = sample
        elif (self.counter - 1) % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 3 * model_output
        elif (self.counter - 2) % 4 == 0:
            self.cur_model_output = self.cur_model_output + 1 / 3 * model_output
        elif (self.counter - 3) % 4 == 0:
            model_output = self.cur_model_output + 1 / 6 * model_output
            self.cur_model_output = 0
        cur_sample = self.cur_sample if self.cur_sample is not None else sample
        prev_sample = self._get_prev_sample(
            cur_sample, timestep, prev_timestep, model_output)
        self.counter += 1
        return prev_sample

    def step_plms(self, model_output, timestep, sample):
        prev_timestep = timestep - (
            self.config.num_train_timesteps // self.num_inference_steps)
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + (
                self.config.num_train_timesteps // self.num_inference_steps)

        if len(self.ets) == 1 and self.counter == 0:
            model_output = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            model_output = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            model_output = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            model_output = (
                23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            model_output = (1 / 24) * (
                55 * self.ets[-1] - 59 * self.ets[-2]
                + 37 * self.ets[-3] - 9 * self.ets[-4])
        prev_sample = self._get_prev_sample(
            sample, timestep, prev_timestep, model_output)
        self.counter += 1
        return prev_sample

    def step(self, model_output, timestep, sample, return_dict: bool = True):
        if (self.counter < len(self.prk_timesteps)
                and not self.config.skip_prk_steps):
            prev_sample = self.step_prk(model_output, timestep, sample)
        else:
            prev_sample = self.step_plms(model_output, timestep, sample)
        if not return_dict:
            return (prev_sample,)
        return types.SimpleNamespace(prev_sample=prev_sample)

    def add_noise(self, original_samples, noise, timesteps):
        a = self.alphas_cumprod[timesteps] ** 0.5
        b = (1 - self.alphas_cumprod[timesteps]) ** 0.5
        while len(a.shape) < len(original_samples.shape):
            a = a.unsqueeze(-1)
            b = b.unsqueeze(-1)
        return a * original_samples + b * noise


class CogVideoXDPMScheduler(ConfigMixin):
    """Marker only: the pipeline's isinstance branch for the two-return-value
    DPM step.  Not exercised by the parity tests (DDIM is the deployed
    default); instantiate the real thing if a DPM parity test is added."""

    order = 1

    def __init__(self, *a, **k):  # pragma: no cover
        raise NotImplementedError("DPM scheduler not shimmed")


class VaeImageProcessor:
    """Tensor-input subset of diffusers VaeImageProcessor.preprocess (the
    reference feeds (b f, c, h, w) torch tensors only)."""

    def __init__(
        self,
        do_resize: bool = True,
        vae_scale_factor: int = 8,
        do_normalize: bool = True,
        do_binarize: bool = False,
        do_convert_grayscale: bool = False,
        **kwargs,
    ):
        self.config = types.SimpleNamespace(
            do_resize=do_resize,
            vae_scale_factor=vae_scale_factor,
            do_normalize=do_normalize,
            do_binarize=do_binarize,
            do_convert_grayscale=do_convert_grayscale,
        )

    def preprocess(self, image, height=None, width=None):
        assert isinstance(image, torch.Tensor) and image.ndim == 4, (
            "shim preprocess supports 4D torch tensors only"
        )
        # (do_convert_grayscale only unsqueezes 3D tensors in diffusers; 4D
        # input is assumed already single-channel -- as the reference's is)
        if self.config.do_resize and (
            height is not None
            and width is not None
            and tuple(image.shape[-2:]) != (height, width)
        ):
            image = F.interpolate(image, size=(height, width))
        do_normalize = self.config.do_normalize
        if do_normalize and image.min() < 0:
            do_normalize = False
        if do_normalize:
            image = 2.0 * image - 1.0
        if self.config.do_binarize:
            image = image.clone()
            image[image < 0.5] = 0
            image[image >= 0.5] = 1
        return image


class VideoProcessor(VaeImageProcessor):
    """Only constructed by the reference pipeline; postprocess_video is not
    reached for output_type latent/numpy."""

    def postprocess_video(self, video, output_type="np"):  # pragma: no cover
        raise NotImplementedError("shim: use output_type='latent' or 'numpy'")


class _AutoencoderKLCogVideoXMarker:
    """Type-annotation stand-in for ``from diffusers.models import
    AutoencoderKLCogVideoX`` (the real instance passed in is the reference's
    own autoencoder_magvit model)."""


# ----------------------------------------------------------------------------
# module registration
# ----------------------------------------------------------------------------


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install():
    """Register the shim as ``diffusers`` in sys.modules (idempotent)."""
    if "diffusers" in sys.modules:
        existing = sys.modules["diffusers"]
        if getattr(existing, "__trajcrafter_shim__", False):
            return
        raise RuntimeError("a real diffusers install is present; shim not needed")

    mods = {
        "diffusers": _module("diffusers", __trajcrafter_shim__=True),
        "diffusers.configuration_utils": _module(
            "diffusers.configuration_utils", ConfigMixin=ConfigMixin,
            register_to_config=register_to_config),
        "diffusers.utils": _module(
            "diffusers.utils", is_torch_version=is_torch_version,
            logging=_LoggingShim(), BaseOutput=BaseOutput,
            replace_example_docstring=replace_example_docstring),
        "diffusers.utils.torch_utils": _module(
            "diffusers.utils.torch_utils",
            maybe_allow_in_graph=maybe_allow_in_graph,
            randn_tensor=randn_tensor),
        "diffusers.callbacks": _module(
            "diffusers.callbacks", PipelineCallback=PipelineCallback,
            MultiPipelineCallbacks=MultiPipelineCallbacks),
        "diffusers.pipelines": _module("diffusers.pipelines"),
        "diffusers.pipelines.pipeline_utils": _module(
            "diffusers.pipelines.pipeline_utils",
            DiffusionPipeline=DiffusionPipeline),
        "diffusers.schedulers": _module(
            "diffusers.schedulers",
            DDIMScheduler=DDIMScheduler,
            EulerDiscreteScheduler=EulerDiscreteScheduler,
            EulerAncestralDiscreteScheduler=EulerAncestralDiscreteScheduler,
            DPMSolverMultistepScheduler=DPMSolverMultistepScheduler,
            PNDMScheduler=PNDMScheduler,
            CogVideoXDDIMScheduler=CogVideoXDDIMScheduler,
            CogVideoXDPMScheduler=CogVideoXDPMScheduler),
        "diffusers.video_processor": _module(
            "diffusers.video_processor", VideoProcessor=VideoProcessor),
        "diffusers.image_processor": _module(
            "diffusers.image_processor", VaeImageProcessor=VaeImageProcessor),
        "diffusers.utils.accelerate_utils": _module(
            "diffusers.utils.accelerate_utils",
            apply_forward_hook=apply_forward_hook),
        "diffusers.loaders": _module("diffusers.loaders"),
        "diffusers.loaders.single_file_model": _module(
            "diffusers.loaders.single_file_model",
            FromOriginalModelMixin=FromOriginalModelMixin),
        "diffusers.models": _module(
            "diffusers.models",
            AutoencoderKLCogVideoX=_AutoencoderKLCogVideoXMarker),
        "diffusers.models.attention": _module(
            "diffusers.models.attention", Attention=Attention,
            FeedForward=FeedForward),
        "diffusers.models.attention_processor": _module(
            "diffusers.models.attention_processor",
            AttentionProcessor=AttentionProcessor,
            CogVideoXAttnProcessor2_0=CogVideoXAttnProcessor2_0,
            FusedCogVideoXAttnProcessor2_0=FusedCogVideoXAttnProcessor2_0),
        "diffusers.models.embeddings": _module(
            "diffusers.models.embeddings", TimestepEmbedding=TimestepEmbedding,
            Timesteps=Timesteps, get_3d_sincos_pos_embed=get_3d_sincos_pos_embed,
            apply_rotary_emb=apply_rotary_emb,
            get_timestep_embedding=get_timestep_embedding,
            get_1d_rotary_pos_embed=get_1d_rotary_pos_embed,
            get_3d_rotary_pos_embed=get_3d_rotary_pos_embed),
        "diffusers.models.modeling_outputs": _module(
            "diffusers.models.modeling_outputs",
            Transformer2DModelOutput=Transformer2DModelOutput,
            AutoencoderKLOutput=AutoencoderKLOutput),
        "diffusers.models.modeling_utils": _module(
            "diffusers.models.modeling_utils", ModelMixin=ModelMixin),
        "diffusers.models.normalization": _module(
            "diffusers.models.normalization", AdaLayerNorm=AdaLayerNorm,
            CogVideoXLayerNormZero=CogVideoXLayerNormZero),
        "diffusers.models.activations": _module(
            "diffusers.models.activations", get_activation=get_activation),
        "diffusers.models.downsampling": _module(
            "diffusers.models.downsampling",
            CogVideoXDownsample3D=CogVideoXDownsample3D),
        "diffusers.models.upsampling": _module(
            "diffusers.models.upsampling",
            CogVideoXUpsample3D=CogVideoXUpsample3D),
        "diffusers.models.autoencoders": _module("diffusers.models.autoencoders"),
        "diffusers.models.autoencoders.vae": _module(
            "diffusers.models.autoencoders.vae", DecoderOutput=DecoderOutput,
            DiagonalGaussianDistribution=DiagonalGaussianDistribution),
    }
    sys.modules.update(mods)
