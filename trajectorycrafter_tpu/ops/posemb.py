"""3D sinusoidal positional embeddings + timestep embeddings.

Matches the published CogVideoX embedding functions consumed by the reference
(models/crosstransformer3d.py:516-528 via diffusers get_3d_sincos_pos_embed,
:531 Timesteps) so converted checkpoints see identical position codes.

The runtime trilinear resize of the table to the actual latent grid
(reference :753-784) is precomputed per (frames, height, width) on host --
the jit program sees a constant, avoiding recompiles and device gathers.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim): [sin(w*p), cos(w*p)] halves."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size,  # (width, height) -- reference argument order
    temporal_size: int,
    spatial_interpolation_scale: float = 1.875,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """-> (T, H*W, embed_dim); channel layout [temporal dim/4 | spatial 3dim/4]."""
    w, h = spatial_size
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4

    grid_h = np.arange(h, dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(w, dtype=np.float32) / spatial_interpolation_scale
    gw, gh = np.meshgrid(grid_w, grid_h)  # each (h, w)
    # 2D embed: first half from the w-grid, second half from the h-grid
    emb_w = _sincos_1d(dim_spatial // 2, gw)  # (h*w, ds/2)
    emb_h = _sincos_1d(dim_spatial // 2, gh)
    pos_spatial = np.concatenate([emb_w, emb_h], axis=1)  # (h*w, ds)

    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    pos_temporal = _sincos_1d(dim_temporal, grid_t)  # (t, dt)

    pos_temporal = np.repeat(pos_temporal[:, np.newaxis, :], h * w, axis=1)
    pos_spatial = np.repeat(pos_spatial[np.newaxis, :, :], temporal_size, axis=0)
    return np.concatenate([pos_temporal, pos_spatial], axis=-1)  # (t, h*w, d)


@lru_cache(maxsize=16)
def resized_pos_embedding(
    embed_dim: int,
    base_frames: int,
    base_height: int,  # post-patch grid of the trained table
    base_width: int,
    frames: int,
    height: int,  # post-patch grid at runtime
    width: int,
    spatial_interpolation_scale: float = 1.875,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """Trained-table pos-emb trilinearly resized to the runtime grid
    (reference :753-784; torch trilinear align_corners=False).

    Returns (frames*height*width, embed_dim) float32, cached per shape.
    """
    table = get_3d_sincos_pos_embed(
        embed_dim,
        (base_width, base_height),
        base_frames,
        spatial_interpolation_scale,
        temporal_interpolation_scale,
    ).astype(np.float32)
    table = table.reshape(base_frames, base_height, base_width, embed_dim)
    if (frames, height, width) != (base_frames, base_height, base_width):
        from trajectorycrafter_tpu.ops.resize import resize_linear

        t = jnp.moveaxis(jnp.asarray(table), -1, 0)[None]  # (1, d, f, h, w)
        t = resize_linear(t, (frames, height, width), align_corners=False)
        table = np.moveaxis(np.asarray(t[0]), 0, -1)
    return table.reshape(frames * height * width, embed_dim)


def timestep_embedding(
    timesteps: jnp.ndarray,  # (B,)
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers Timesteps semantics)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb
