"""Binary morphology on-device (replaces the host cv2.dilate round-trip in
/root/reference/models/utils.py:585-626 ``clean_points``).

For a binary mask, cv2.dilate with an all-ones 5x5 kernel is exactly a 5x5
max-filter, which XLA expresses as ``reduce_window`` -- so the mask cleanup
stays on the TPU instead of bouncing through numpy/cv2/PIL.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dilate(mask: jnp.ndarray, size: int = 5, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation of an (h, w) mask with an all-ones size x size kernel."""
    pad = size // 2
    out = mask
    for _ in range(iterations):
        out = jax.lax.reduce_window(
            out,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(size, size),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
        )
    return out


def erode(mask: jnp.ndarray, size: int = 5, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion: min-filter = -maxpool(-x) (reference
    utils_autoregressive.py:106-109)."""
    pad = size // 2
    out = mask
    for _ in range(iterations):
        out = -jax.lax.reduce_window(
            -out,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(size, size),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
        )
    return out


def mask_open(mask: jnp.ndarray, size: int = 9, n_erosion: int = 1,
              n_dilation: int = 1) -> jnp.ndarray:
    """Morphological opening of a (h, w) soft mask: binarise at 0.5, erode,
    dilate (reference utils_autoregressive.py:83-113
    ``clean_single_mask_simple`` defaults kernel 9 / 1 / 1 at call site
    autoregressive_loop_alignment.py:597-602)."""
    binary = (mask > 0.5).astype(jnp.float32)
    binary = erode(binary, size=size, iterations=n_erosion)
    return dilate(binary, size=size, iterations=n_dilation)


def clean_mask_single(
    warped: jnp.ndarray,  # (h, w, c) in [-1, 1]
    mask: jnp.ndarray,  # (h, w) 1=known
    size: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dilate the disocclusion holes and zero them from the warped frame.

    Mirrors reference ``clean_points``: holes = binarised (1 - mask) dilated by
    a 5x5 kernel; the warped frame (mapped to [0,1]) is zeroed inside the
    dilated holes and mapped back to [-1, 1]; the returned mask is 1 - holes.
    """
    holes = jnp.where(1.0 - mask >= 0.5, 1.0, 0.0)
    holes = dilate(holes, size=size)
    holes = jnp.where(holes >= 0.5, 1.0, 0.0)
    frame01 = (warped + 1.0) / 2.0
    frame01 = frame01 * (1.0 - holes)[..., None]
    return frame01 * 2.0 - 1.0, 1.0 - holes


clean_mask_batch = jax.vmap(clean_mask_single, in_axes=(0, 0))
