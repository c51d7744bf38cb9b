"""Interpolation with torch ``F.interpolate`` semantics.

The reference pipeline leans on four torch resize flavours:
  * bilinear, align_corners=False  (frame/render downscale, demo.py:94-100)
  * nearest                        (mask downscale, demo.py:100)
  * trilinear, align_corners=False (latent mask resize, pipeline:127-160)
  * trilinear, align_corners=True  (latent-space mask, pipeline:1001-1006)

``jax.image.resize(method='linear')`` equals align_corners=False (half-pixel
centres), so that path delegates; align_corners=True and nearest are
implemented by explicit gather so behaviour matches torch exactly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _gather_axis_linear_ac(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """1D linear resize along ``axis`` with align_corners=True."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1:
        return jnp.take(x, jnp.array([0]), axis=axis)
    scale = (in_size - 1) / (out_size - 1)
    coords = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo.astype(jnp.float32)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - frac) + jnp.take(x, hi, axis=axis) * frac


def _gather_axis_linear_hp(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """1D linear resize along ``axis`` with half-pixel centres
    (torch align_corners=False, antialias=False)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo.astype(jnp.float32)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - frac) + jnp.take(x, hi, axis=axis) * frac


def _gather_axis_nearest(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Torch 'nearest' (floor of src index, asymmetric) along ``axis``."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    idx = jnp.clip((jnp.arange(out_size, dtype=jnp.float32) * scale).astype(jnp.int32), 0, in_size - 1)
    return jnp.take(x, idx, axis=axis)


def resize_linear(
    x: jnp.ndarray,
    out_spatial: Sequence[int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """N-D linear resize of the trailing len(out_spatial) axes.

    Matches torch bilinear/trilinear; leading axes are batch/channel.
    """
    ndim_sp = len(out_spatial)
    gather = _gather_axis_linear_ac if align_corners else _gather_axis_linear_hp
    out = x
    for i, size in enumerate(out_spatial):
        out = gather(out, size, x.ndim - ndim_sp + i)
    return out


def resize_nearest(x: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    """Torch 'nearest' (not nearest-exact) resize of trailing axes."""
    ndim_sp = len(out_spatial)
    out = x
    for i, size in enumerate(out_spatial):
        out = _gather_axis_nearest(out, size, x.ndim - ndim_sp + i)
    return out


def resize_mask_latent(
    mask: jnp.ndarray,  # (b, c, f, h, w)
    latent_shape: Tuple[int, int, int],  # (f_lat, h_lat, w_lat)
    process_first_frame_only: bool = True,
) -> jnp.ndarray:
    """Latent-space mask resize (reference pipeline_trajectorycrafter.py:127-160).

    The first pixel frame maps alone onto the first latent frame; the
    remaining frames map onto the remaining latent frames (trilinear,
    align_corners=False).
    """
    f_lat, h_lat, w_lat = latent_shape
    if not process_first_frame_only:
        return resize_linear(mask, (f_lat, h_lat, w_lat), align_corners=False)
    first = resize_linear(mask[:, :, 0:1], (1, h_lat, w_lat), align_corners=False)
    if f_lat == 1:
        return first
    rest = resize_linear(mask[:, :, 1:], (f_lat - 1, h_lat, w_lat), align_corners=False)
    return jnp.concatenate([first, rest], axis=2)
