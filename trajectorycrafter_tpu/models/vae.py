"""CogVideoX / MAGVIT-style 3D causal video VAE in Flax (TPU-native).

Functional re-design of the reference autoencoder
(/root/reference/models/autoencoder_magvit.py): 4x temporal + 8x8 spatial
compression, 16 latent channels, scaling factor 1.15258426.

Key TPU-first differences from the torch implementation:
  * channel-last NTHWC layout everywhere (feeds XLA conv3d directly);
  * the per-module ``conv_cache`` python attribute ("fake context parallel",
    reference :136-163) becomes an explicit **cache pytree** threaded through
    every call, so chunked encode/decode streams through ``lax.scan`` with the
    cache as carry -- arbitrary-length videos in one compiled program;
  * no SafeConv3d memory splitting (XLA fuses/schedules); no host chunk loop.

Chunk semantics match the reference exactly (encode: first chunk
4+remainder frames then 4-frame chunks, :1199-1211; decode: first chunk
2+remainder latent frames then 2-frame chunks, :1235-1245), which is required
for bit-comparable outputs because the causal caches see the same boundaries.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.resize import resize_nearest

Cache = Optional[Dict[str, Any]]

VAE_SCALING_FACTOR = 1.15258426


def _sub(cache: Cache, name: str) -> Cache:
    if cache is None:
        return None
    return cache.get(name)


class _ShiftedConv2dStack(nn.Module):
    """conv3d expressed as kt temporally-shifted 2D convs, summed.

    Mathematically identical to the (kt,kh,kw) VALID conv3d (same kernel
    layout, so the param tree and checkpoints are interchangeable with
    nn.Conv), but measured 1.22-1.30x faster on v5e at the VAE decoder's hot
    shapes (chained-dispatch probe 2026-08-18: 128ch@224x1024 25.9 -> 20.0
    ms, 256ch@288x512 42.2 -> 34.7 ms) -- XLA tiles the batched 2D convs
    onto the MXU better than the 3D conv.  Requires temporal stride 1 /
    dilation 1; input must already be spatially padded (VALID).
    """

    features: int
    kernel_size: Tuple[int, int, int]
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        # plain lecun_normal matches nn.Conv's default (fan_in = C*kt*kh*kw)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        b, tp, h, w, c = x.shape
        t = tp - (kt - 1)
        dn = jax.lax.conv_dimension_numbers(
            (b * t, h, w, c), (kh, kw, c, self.features),
            ("NHWC", "HWIO", "NHWC"))
        out = None
        for toff in range(kt):
            xi = jax.lax.dynamic_slice_in_dim(x, toff, t, axis=1)
            o = jax.lax.conv_general_dilated(
                xi.reshape(b * t, h, w, c), kernel[toff], (1, 1), "VALID",
                dimension_numbers=dn)
            out = o if out is None else out + o
        ho, wo = out.shape[1], out.shape[2]
        return out.reshape(b, t, ho, wo, self.features) + bias


class CausalConv3d(nn.Module):
    """Temporally causal conv3d with an explicit streaming cache.

    The cache holds the last (kt-1) input frames; when no cache is given the
    clip's first frame is replicated (reference :136-146).

    ``decompose``: lower the temporal taps as kt shifted 2D convs summed
    (:class:`_ShiftedConv2dStack`).  None = auto: on for stride-1/dilation-1
    kt>1 convs on the TPU backend when the chunk's temporal extent is >= 6
    output frames, off elsewhere.  Chained on-chip probes (2026-08-18):
    at T=8 (the decoder's hot chunks) the decomposition wins 1.2-1.3x
    (128ch@224x1024 25.9 -> 20.0 ms; T=8 128ch@576x1024 57.0 -> 43.2 ms),
    at T=4 (encoder chunks) it loses (34.9 -> 44.6 ms) -- XLA's batched 2D
    conv tiling needs the deeper N=B*T batch to beat the 3D conv.
    Summation order differs from conv3d so results match only to
    accumulation rounding.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: int = 1  # temporal stride
    dilation: int = 1
    decompose: Optional[bool] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        kt, kh, kw = self.kernel_size
        new_cache = None
        if kt > 1:
            ncache = self.dilation * (kt - 1) + (1 - self.stride)
            if cache is None:
                pad = jnp.repeat(x[:, :1], ncache, axis=1)
            else:
                pad = cache["conv"].astype(x.dtype)
            x = jnp.concatenate([pad, x], axis=1)
            new_cache = {"conv": x[:, x.shape[1] - ncache :]}
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
            mode="constant",
        )
        eligible = kt > 1 and self.stride == 1 and self.dilation == 1
        decompose = self.decompose
        if decompose is None:
            # escape hatch mirroring TRAJCRAFTER_INT8_IMPL: force the
            # lowering if a Mosaic/XLA regression ever flips the measured win
            impl = os.environ.get("TRAJCRAFTER_CONV3D_IMPL")
            if impl == "conv3d":
                decompose = False
            elif impl == "decomposed":
                decompose = True
            else:
                t_out = x.shape[1] - (kt - 1) if eligible else 0
                decompose = (eligible and t_out >= 6
                             and jax.default_backend() == "tpu")
        if decompose and eligible:
            y = _ShiftedConv2dStack(
                self.features, self.kernel_size, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv")(x)
        else:
            y = nn.Conv(
                self.features,
                kernel_size=(kt, kh, kw),
                strides=(self.stride, 1, 1),
                kernel_dilation=(self.dilation, 1, 1),
                padding="VALID",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        return y, new_cache


class SpatialNorm3D(nn.Module):
    """Spatially conditioned GroupNorm (MoVQ, reference :166-212).

    zq is nearest-resized onto f's grid with the odd-T first-frame split.
    """

    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f: jnp.ndarray, zq: jnp.ndarray, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        ft, fh, fw = f.shape[1:4]
        if f.shape[1] > 1 and f.shape[1] % 2 == 1:
            zf = resize_nearest(jnp.moveaxis(zq[:, :1], -1, 1), (1, fh, fw))
            zr = resize_nearest(jnp.moveaxis(zq[:, 1:], -1, 1), (ft - 1, fh, fw))
            zq = jnp.moveaxis(jnp.concatenate([zf, zr], axis=2), 1, -1)
        else:
            zq = jnp.moveaxis(
                resize_nearest(jnp.moveaxis(zq, -1, 1), (ft, fh, fw)), 1, -1
            )
        norm = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="norm_layer",
        )(f.astype(jnp.float32)).astype(f.dtype)
        conv_y = CausalConv3d(f.shape[-1], (1, 1, 1), dtype=self.dtype,
                              param_dtype=self.param_dtype, name="conv_y")
        conv_b = CausalConv3d(f.shape[-1], (1, 1, 1), dtype=self.dtype,
                              param_dtype=self.param_dtype, name="conv_b")
        y, _ = conv_y(zq, None)
        b, _ = conv_b(zq, None)
        return norm * y + b, None


class ResnetBlock3D(nn.Module):
    """Causal 3D resnet block (reference :215-354)."""

    out_channels: int
    spatial_norm: bool = False  # use SpatialNorm3D conditioned on zq (decoder)
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        in_ch = x.shape[-1]
        h = x
        if self.spatial_norm:
            h, _ = SpatialNorm3D(self.groups, self.dtype, self.param_dtype, name="norm1")(h, zq, None)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="norm1")(h.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h, c1 = CausalConv3d(self.out_channels, (3, 3, 3), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv1")(h, _sub(cache, "conv1"))
        if self.spatial_norm:
            h, _ = SpatialNorm3D(self.groups, self.dtype, self.param_dtype, name="norm2")(h, zq, None)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="norm2")(h.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h, c2 = CausalConv3d(self.out_channels, (3, 3, 3), dtype=self.dtype,
                             param_dtype=self.param_dtype, name="conv2")(h, _sub(cache, "conv2"))

        if in_ch != self.out_channels:
            # 1x1x1 shortcut (SafeConv3d in the reference, :311-317)
            x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h, {"conv1": c1, "conv2": c2}


class Downsample3D(nn.Module):
    """CogVideoX downsample: optional 2x time avg-pool (odd-T first frame kept)
    + spatially strided conv with asymmetric (0,1,0,1) pad."""

    compress_time: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.compress_time:
            if t % 2 == 1 and t > 1:
                first, rest = x[:, :1], x[:, 1:]
                rest = rest.reshape(b, (t - 1) // 2, 2, h, w, c).mean(axis=2)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = x.reshape(b, t // 2, 2, h, w, c).mean(axis=2)
        t2 = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = x.reshape(b * t2, h + 1, w + 1, c)
        x = nn.Conv(c, kernel_size=(3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv")(x)
        return x.reshape(b, t2, *x.shape[1:])


class Upsample3D(nn.Module):
    """CogVideoX upsample: nearest 2x (time doubled when compressing, odd-T
    first frame spatial-only) + 3x3 conv per frame."""

    compress_time: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
                rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2), 2, axis=3)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        b2, t2, h2, w2, c2 = x.shape
        x = x.reshape(b2 * t2, h2, w2, c2)
        x = nn.Conv(c, kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        return x.reshape(b2, t2, h2, w2, c)


class DownBlock3D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_downsample: bool = True
    compress_time: bool = False
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        new_cache = {}
        for i in range(self.num_layers):
            name = f"resnets_{i}"
            x, new_cache[name] = ResnetBlock3D(
                self.out_channels, groups=self.groups, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name
            )(x, None, _sub(cache, name))
        if self.add_downsample:
            x = Downsample3D(self.compress_time, self.dtype, self.param_dtype,
                             name="downsamplers_0")(x)
        return x, new_cache


class MidBlock3D(nn.Module):
    num_layers: int = 2
    spatial_norm: bool = False
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        new_cache = {}
        for i in range(self.num_layers):
            name = f"resnets_{i}"
            x, new_cache[name] = ResnetBlock3D(
                x.shape[-1], spatial_norm=self.spatial_norm, groups=self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )(x, zq, _sub(cache, name))
        return x, new_cache


class UpBlock3D(nn.Module):
    out_channels: int
    num_layers: int = 4
    add_upsample: bool = True
    compress_time: bool = False
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        new_cache = {}
        for i in range(self.num_layers):
            name = f"resnets_{i}"
            x, new_cache[name] = ResnetBlock3D(
                self.out_channels, spatial_norm=True, groups=self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )(x, zq, _sub(cache, name))
        if self.add_upsample:
            x = Upsample3D(self.compress_time, self.dtype, self.param_dtype,
                           name="upsamplers_0")(x)
        return x, new_cache


class Encoder3D(nn.Module):
    """(B, T, H, W, 3) -> (B, T', H/8, W/8, 2*latent) moments."""

    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compress_level: int = 2
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        new_cache = {}
        x, new_cache["conv_in"] = CausalConv3d(
            self.block_out_channels[0], (3, 3, 3), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_in")(x, _sub(cache, "conv_in"))
        n = len(self.block_out_channels)
        for i in range(n):
            name = f"down_blocks_{i}"
            x, new_cache[name] = DownBlock3D(
                self.block_out_channels[i],
                num_layers=self.layers_per_block,
                add_downsample=i < n - 1,
                compress_time=i < self.temporal_compress_level,
                groups=self.norm_num_groups,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )(x, _sub(cache, name))
        x, new_cache["mid_block"] = MidBlock3D(
            2, spatial_norm=False, groups=self.norm_num_groups, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mid_block")(x, None, _sub(cache, "mid_block"))
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm_out")(
            x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        x, new_cache["conv_out"] = CausalConv3d(
            2 * self.latent_channels, (3, 3, 3), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out")(x, _sub(cache, "conv_out"))
        return x, new_cache


class Decoder3D(nn.Module):
    """(B, T', H/8, W/8, latent) -> (B, T, H, W, 3)."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compress_level: int = 2
    norm_num_groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, cache: Cache) -> Tuple[jnp.ndarray, Cache]:
        zq = z
        rev = list(reversed(self.block_out_channels))
        new_cache = {}
        x, new_cache["conv_in"] = CausalConv3d(
            rev[0], (3, 3, 3), dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv_in")(z, _sub(cache, "conv_in"))
        x, new_cache["mid_block"] = MidBlock3D(
            2, spatial_norm=True, groups=self.norm_num_groups, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mid_block")(x, zq, _sub(cache, "mid_block"))
        n = len(rev)
        for i in range(n):
            name = f"up_blocks_{i}"
            x, new_cache[name] = UpBlock3D(
                rev[i],
                num_layers=self.layers_per_block + 1,
                add_upsample=i < n - 1,
                compress_time=i < self.temporal_compress_level,
                groups=self.norm_num_groups,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )(x, zq, _sub(cache, name))
        x, _ = SpatialNorm3D(self.norm_num_groups, self.dtype, self.param_dtype,
                             name="norm_out")(x, zq, None)
        x = nn.silu(x)
        x, new_cache["conv_out"] = CausalConv3d(
            self.out_channels, (3, 3, 3), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out")(x, _sub(cache, "conv_out"))
        return x, new_cache


class AutoencoderKLCogVideoX(nn.Module):
    """Full VAE wrapper.  encode/decode operate on channel-last video."""

    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    scaling_factor: float = VAE_SCALING_FACTOR
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder3D(
            latent_channels=self.latent_channels,
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.decoder = Decoder3D(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def encode_chunk(self, x, cache: Cache):
        return self.encoder(x, cache)

    def decode_chunk(self, z, cache: Cache):
        return self.decoder(z, cache)

    def __call__(self, x):
        """Single-chunk autoencode (for init/shape-tracing only)."""
        moments, _ = self.encoder(x, None)
        mean = moments[..., : self.latent_channels]
        dec, _ = self.decoder(mean, None)
        return dec


# ----------------------------------------------------------------------------
# Chunked streaming encode/decode (jit-compiled; scan over uniform chunks)
# ----------------------------------------------------------------------------


def _tree_astype(tree, dtype):
    return jax.tree.map(lambda a: a.astype(dtype), tree)


@partial(jax.jit, static_argnames=("model",))
def vae_encode(model: AutoencoderKLCogVideoX, params, video: jnp.ndarray) -> jnp.ndarray:
    """video (B, T, H, W, 3) -> latent moments (B, T_lat, H/8, W/8, 2C).

    Chunking matches the reference (:1199-1211): the first chunk takes
    4 + (T mod 4) frames, every later chunk exactly 4, with the causal cache
    carried across chunks through ``lax.scan``.
    """
    b, t, h, w, _ = video.shape
    apply = lambda chunk, cache: model.apply({"params": params}, chunk, cache,
                                             method=AutoencoderKLCogVideoX.encode_chunk)
    if t <= 4:
        moments, _ = apply(video, None)
        return moments
    rem = t % 4
    first = video[:, : 4 + rem]
    moments0, cache = apply(first, None)
    nchunks = (t - 4 - rem) // 4
    rest = video[:, 4 + rem :].reshape(b, nchunks, 4, h, w, video.shape[-1])
    rest = jnp.moveaxis(rest, 1, 0)  # (n, b, 4, h, w, c)

    def step(cache, chunk):
        m, new_cache = apply(chunk, cache)
        return new_cache, m

    _, ms = jax.lax.scan(step, cache, rest)
    ms = jnp.moveaxis(ms, 0, 1)  # (b, n, t_lat, ...)
    ms = ms.reshape(b, -1, *ms.shape[3:])
    return jnp.concatenate([moments0, ms], axis=1)


@partial(jax.jit, static_argnames=("model",))
def vae_decode(model: AutoencoderKLCogVideoX, params, latents: jnp.ndarray) -> jnp.ndarray:
    """latents (B, T_lat, H/8, W/8, C) -> video (B, T, H, W, 3).

    First chunk 2 + (T_lat mod 2) latent frames, then 2-frame chunks
    (reference :1235-1245).
    """
    b, t, h, w, c = latents.shape
    apply = lambda chunk, cache: model.apply({"params": params}, chunk, cache,
                                             method=AutoencoderKLCogVideoX.decode_chunk)
    if t <= 2:
        dec, _ = apply(latents, None)
        return dec
    rem = t % 2
    first = latents[:, : 2 + rem]
    dec0, cache = apply(first, None)
    nchunks = (t - 2 - rem) // 2
    rest = latents[:, 2 + rem :].reshape(b, nchunks, 2, h, w, c)
    rest = jnp.moveaxis(rest, 1, 0)

    def step(cache, chunk):
        d, new_cache = apply(chunk, cache)
        return new_cache, d

    _, ds = jax.lax.scan(step, cache, rest)
    ds = jnp.moveaxis(ds, 0, 1)
    ds = ds.reshape(b, -1, *ds.shape[3:])
    return jnp.concatenate([dec0, ds], axis=1)


def vae_decode_tiled(
    model: AutoencoderKLCogVideoX,
    params,
    latents: jnp.ndarray,  # (B, T_lat, H/8, W/8, C)
    tile_latent_height: int = 30,
    tile_latent_width: int = 45,
    overlap_factor_h: float = 1.0 / 6.0,
    overlap_factor_w: float = 1.0 / 5.0,
) -> jnp.ndarray:
    """Spatially tiled decode with linear overlap blending
    (reference autoencoder_magvit.py:1302-1392 ``tiled_decode``).

    Memory option for large frames: each latent tile decodes independently
    (temporal chunking inside vae_decode still applies); rows/columns blend
    over the overlap with linear ramps.  Matches the reference's tiling
    arithmetic: stride = tile * (1 - overlap), pixel blend extent =
    8 * tile * overlap.
    """
    b, t, h, w, c = latents.shape
    overlap_h = int(tile_latent_height * (1 - overlap_factor_h))
    overlap_w = int(tile_latent_width * (1 - overlap_factor_w))
    blend_h_px = int(8 * tile_latent_height * overlap_factor_h)
    blend_w_px = int(8 * tile_latent_width * overlap_factor_w)
    row_limit_h = tile_latent_height * 8 - blend_h_px
    row_limit_w = tile_latent_width * 8 - blend_w_px

    rows = []
    for i in range(0, h, overlap_h):
        row = []
        for j in range(0, w, overlap_w):
            tile = latents[:, :, i : i + tile_latent_height, j : j + tile_latent_width]
            row.append(vae_decode(model, params, tile))
        rows.append(row)

    def blend_v(a, bt, extent):
        extent = min(a.shape[2], bt.shape[2], extent)
        ramp = (jnp.arange(extent) / extent).reshape(1, 1, extent, 1, 1)
        mixed = a[:, :, -extent:] * (1 - ramp) + bt[:, :, :extent] * ramp
        return jnp.concatenate([mixed, bt[:, :, extent:]], axis=2)

    def blend_h(a, bt, extent):
        extent = min(a.shape[3], bt.shape[3], extent)
        ramp = (jnp.arange(extent) / extent).reshape(1, 1, 1, extent, 1)
        mixed = a[:, :, :, -extent:] * (1 - ramp) + bt[:, :, :, :extent] * ramp
        return jnp.concatenate([mixed, bt[:, :, :, extent:]], axis=3)

    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_v(rows[i - 1][j], tile, blend_h_px)
            if j > 0:
                tile = blend_h(row[j - 1], tile, blend_w_px)
            out_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)[:, :, : h * 8, : w * 8]


# Largest latent frame the non-tiled decoder can hold on a 16 GB chip:
# 48x84 (384x672 px) fits; 72x128 (576x1024) needs >16 GB of up-block
# activations (measured OOM, bench_stages.py).  Above this, decode in
# Peak-memory model of the one-shot decoder: the last up-block holds ~3
# copies of the (T_px, H, W, 128) bf16 activation (input/output plus the
# decomposed-conv3d shifted sum) plus caches and the fp32 output -- ~3.5x
# that tensor.  At 49f@384x672 that is ~11 GB; at 49f@576x1024 ~25 GB.
_DECODE_PEAK_FACTOR = 128 * 2 * 3.5
_DECODE_HBM_FRACTION = 0.60


def vae_decode_auto(
    model: AutoencoderKLCogVideoX,
    params,
    latents: jnp.ndarray,  # (B, T_lat, H/8, W/8, C)
    # Steady-state chip probes 2026-08-21: strips of 24 decode the 48x84
    # grid in 3.19 s total (vs 2.85 s one-shot -- 12% tiling overhead) and
    # divide the production latent heights (48, 72) more evenly than 28.
    # (An earlier "28-strip pathology" reading of 59.9 s was a measurement
    # artifact: block_until_ready returns early through the axon relay, so
    # the first timed iteration absorbed the remote strip compiles.)
    strip_height: int = 24,
    peak_divisor: int = 1,
) -> jnp.ndarray:
    """Decode, switching to spatially tiled strips when the one-shot
    decoder's estimated activation peak does not comfortably fit HBM (the
    reference enables VAE tiling the same way for large frames,
    demo.py:668-671 / autoencoder_magvit.py:1302).

    The decision is made BEFORE dispatch on purpose: a jit execution that
    RESOURCE_EXHAUSTs mid-run can leave a remote backend unable to serve
    even tiny allocations (observed on chip 2026-08-21), so a
    try-one-shot/fallback-tiled structure cannot recover.  ``peak_divisor``
    discounts the estimate when GSPMD shards the decode spatially (mesh
    size), where per-device activations shrink accordingly.
    """
    b, t_lat, h, w, _ = latents.shape
    t_px = (t_lat - 1) * 4 + 1
    est_peak = (b * t_px * (8 * h) * (8 * w) * _DECODE_PEAK_FACTOR
                / max(1, peak_divisor))
    from trajectorycrafter_tpu.utils.offload import device_hbm_bytes

    if est_peak <= _DECODE_HBM_FRACTION * device_hbm_bytes():
        return vae_decode(model, params, latents)
    return vae_decode_tiled(
        model, params, latents,
        tile_latent_height=strip_height, tile_latent_width=w,
        overlap_factor_h=1.0 / 7.0, overlap_factor_w=0.0,
    )


def sample_posterior(moments: jnp.ndarray, key, latent_channels: int = 16,
                     noise: jnp.ndarray | None = None):
    """DiagonalGaussian sample from concatenated (mean, logvar) moments.

    ``noise`` overrides the draw (RNG-parity hook: pass torch-generated noise
    from utils/torch_compat to bit-match the reference's global-RNG
    ``DiagonalGaussianDistribution.sample()``)."""
    mean = moments[..., :latent_channels]
    logvar = jnp.clip(moments[..., latent_channels:], -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    if noise is None:
        noise = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + std * noise.astype(mean.dtype)


def posterior_mode(moments: jnp.ndarray, latent_channels: int = 16):
    return moments[..., :latent_channels]
