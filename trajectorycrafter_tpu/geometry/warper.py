"""Reference-compatible Warper facade over the JAX splat kernels.

API mirrors /root/reference/models/utils.py:213-347 (``Warper.forward_warp``)
with torch-style NCHW batches, so code written against the reference ports
directly; internally everything is channel-last vmapped jit.

Unlike the reference -- whose device mapper silently fell back to CPU fp32
(models/utils.py:668-682) -- this runs on the accelerator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.morphology import clean_mask_single
from trajectorycrafter_tpu.ops.splat import (
    bilinear_splat,
    forward_warp_single,
    pixel_grid,
    transform_points,
)


def _nchw_to_hwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -3, -1)


def _hwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, -3)


def forward_warp(
    frame1: jnp.ndarray,  # (b, 3, h, w) in [-1, 1]
    mask1: Optional[jnp.ndarray],  # (b, 1, h, w) or None
    depth1: jnp.ndarray,  # (b, 1, h, w)
    transformation1: jnp.ndarray,  # (b, 4, 4)
    transformation2: jnp.ndarray,  # (b, 4, 4)
    intrinsic1: jnp.ndarray,  # (b, 3, 3)
    intrinsic2: Optional[jnp.ndarray] = None,  # (b, 3, 3)
    mask: bool = False,
    twice: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Batched forward warp with the reference's exact signature/semantics.

    Returns (warped_frame2 (b,3,h,w), mask2 (b,1,h,w), warped_depth2 (b,1,h,w),
    flow12 (b,2,h,w) or None for twice mode).
    """
    frames = _nchw_to_hwc(jnp.asarray(frame1, jnp.float32))
    depths = jnp.asarray(depth1, jnp.float32)[:, 0]
    masks = None if mask1 is None else jnp.asarray(mask1, jnp.float32)[:, 0]
    if intrinsic2 is None:
        intrinsic2 = intrinsic1

    def one(frame, m, depth, t1, t2, k1, k2):
        h, w = depth.shape
        pts = transform_points(depth, t1, t2, k1, k2)
        coords = pts[..., :2] / pts[..., 2:3]
        trans_depth = pts[..., 2]
        flow = coords - pixel_grid(h, w, depth.dtype)

        warped, mask2 = bilinear_splat(frame, m, trans_depth, flow, None, is_image=True)
        warped_depth, _ = bilinear_splat(
            trans_depth[..., None], m, trans_depth, flow, None, is_image=False
        )
        if not twice:
            if mask:
                warped, mask2 = clean_mask_single(warped, mask2)
            return warped, mask2, warped_depth[..., 0], flow

        if mask:
            warped, mask2 = clean_mask_single(warped, mask2)
            warped_depth, _ = clean_mask_single(warped_depth, mask2)
        warped_flow, _ = bilinear_splat(flow, m, trans_depth, flow, None, is_image=False)
        twice_frame, twice_mask = bilinear_splat(
            warped, mask2, warped_depth[..., 0], -warped_flow, None, is_image=True
        )
        twice_depth, _ = bilinear_splat(
            warped_depth, mask2, warped_depth[..., 0], -warped_flow, None, is_image=False
        )
        if mask:
            twice_frame, twice_mask = clean_mask_single(twice_frame, twice_mask)
            twice_depth, _ = clean_mask_single(twice_depth, twice_mask)
        return twice_frame, twice_mask, twice_depth[..., 0], flow

    m_axes = None if masks is None else 0
    out = jax.vmap(one, in_axes=(0, m_axes, 0, 0, 0, 0, 0))(
        frames, masks, depths, transformation1, transformation2, intrinsic1, intrinsic2
    )
    warped, mask2, wdepth, flow = out
    return (
        _hwc_to_nchw(warped),
        mask2[:, None],
        wdepth[:, None],
        None if twice else _hwc_to_nchw(flow),
    )


class Warper:
    """Drop-in replacement for the reference Warper (models/utils.py:213)."""

    def __init__(self, resolution: Optional[tuple] = None):
        self.resolution = resolution
        self._jitted = {}

    def forward_warp(self, frame1, mask1, depth1, transformation1, transformation2,
                     intrinsic1, intrinsic2=None, mask=False, twice=False):
        if self.resolution is not None:
            assert tuple(frame1.shape[2:4]) == tuple(self.resolution)
        key = (bool(mask), bool(twice), intrinsic2 is None, mask1 is None)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda f, m, d, t1, t2, k1, k2: forward_warp(
                    f, m, d, t1, t2, k1, k2, mask=key[0], twice=key[1]
                )
            )
        if intrinsic2 is None:
            intrinsic2 = intrinsic1
        return self._jitted[key](
            jnp.asarray(frame1), None if mask1 is None else jnp.asarray(mask1),
            jnp.asarray(depth1), jnp.asarray(transformation1),
            jnp.asarray(transformation2), jnp.asarray(intrinsic1),
            jnp.asarray(intrinsic2),
        )

    @staticmethod
    def create_grid(b, h, w):
        grid = jnp.moveaxis(pixel_grid(h, w), -1, 0)
        return jnp.broadcast_to(grid[None], (b, 2, h, w))
