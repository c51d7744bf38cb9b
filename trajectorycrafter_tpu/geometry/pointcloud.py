"""Global point-cloud lifting + z-buffer rendering (XLA scatter-min).

TPU-native re-expression of the reference's global point-cloud pipeline
(notebooks/06_10_25_vggt/warper_point_cloud.py): ``lift_to_3d_pointcloud``
(:12-77, world-space unprojection with inverse extrinsics),
``render_pointcloud_zbuffer_vectorized`` (:445-646, unique+scatter_reduce
amin z-buffer).  The torch ``scatter_reduce('amin')`` + closest-point-mask
becomes a fused ``.at[idx].min`` scatter over linearised pixel bins followed
by a winner-takes-pixel color scatter -- static shapes, one jit program for
any number of points.

Used by the autoregressive-v2 orchestrator (autoregressive_global.py:54-81,
203-210) and the consistent-depth subsystem.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.splat import pixel_grid

_FAR = 1e10
_NEAR_CULL = 0.01  # reference warper_point_cloud.py:471 (depths > 0.01)


def lift_to_pointcloud(
    frame: jnp.ndarray,  # (h, w, 3) colors in [0, 1]
    depth: jnp.ndarray,  # (h, w)
    intrinsic: jnp.ndarray,  # (3, 3)
    c2w: jnp.ndarray,  # (4, 4) camera-to-world
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject every pixel to world space -> (points (h*w, 3), colors)."""
    h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)
    pix = jnp.concatenate([grid, jnp.ones((h, w, 1), depth.dtype)], -1)
    with jax.default_matmul_precision("highest"):
        rays = pix @ jnp.linalg.inv(intrinsic).T
        cam = rays * depth[..., None]
        world = cam @ c2w[:3, :3].T + c2w[:3, 3]
    return world.reshape(-1, 3), frame.reshape(-1, 3)


def merge_pointclouds(points_list, colors_list):
    return jnp.concatenate(points_list, 0), jnp.concatenate(colors_list, 0)


def downsample_pointcloud(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    weights: Optional[jnp.ndarray] = None,
):
    """Confidence-weighted subsampling (reference :138-156, multinomial)."""
    n = points.shape[0]
    if weights is None:
        idx = jax.random.choice(key, n, (num_samples,), replace=num_samples > n)
    else:
        idx = jax.random.choice(key, n, (num_samples,), replace=num_samples > n,
                                p=weights / jnp.sum(weights))
    return points[idx], colors[idx]


@partial(jax.jit, static_argnames=("height", "width", "point_size"))
def render_zbuffer(
    points: jnp.ndarray,  # (n, 3) world
    colors: jnp.ndarray,  # (n, 3)
    intrinsic: jnp.ndarray,  # (3, 3)
    w2c: jnp.ndarray,  # (4, 4) world-to-camera extrinsic
    height: int,
    width: int,
    point_size: int = 1,
    background: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Z-buffered point rendering -> (image (h,w,3), depth (h,w), mask (h,w)).

    Nearest point per pixel wins (reference :488-519); ``point_size`` splats
    each point over a size x size neighbourhood (reference :522-646).
    """
    with jax.default_matmul_precision("highest"):
        cam = points @ w2c[:3, :3].T + w2c[:3, 3]
        proj = cam @ intrinsic.T
    z = proj[:, 2]
    x = proj[:, 0] / z
    y = proj[:, 1] / z

    npix = height * width
    # validity on the UN-rounded coordinates (reference :471-474)
    valid = (z > _NEAR_CULL) & (x >= 0) & (x < width) & (y >= 0) & (y < height)

    zbuf = jnp.full((npix + 1,), _FAR, jnp.float32)
    if point_size == 1:
        # round then clamp into the frame (reference :485-486)
        xi = jnp.clip(jnp.round(x), 0, width - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.round(y), 0, height - 1).astype(jnp.int32)
        offsets = [(0, 0)]
    else:
        # (2r+1)^2 square splat around the unrounded position, each offset
        # rounded and bounds-checked without clamping (reference :565-605)
        xi, yi = x, y
        r = point_size // 2
        offsets = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    idx_list = []
    for dy, dx in offsets:
        if point_size == 1:
            xo, yo = xi, yi
            ok = valid
        else:
            xo = jnp.round(xi + dx).astype(jnp.int32)
            yo = jnp.round(yi + dy).astype(jnp.int32)
            ok = valid & (xo >= 0) & (xo < width) & (yo >= 0) & (yo < height)
        idx = jnp.where(ok, yo * width + xo, npix)  # dump slot for culled
        idx_list.append(idx)
        zbuf = zbuf.at[idx].min(z)

    # winners: points whose z equals the z-buffer minimum at their pixel
    img = jnp.full((npix + 1, 3), background, jnp.float32)
    for idx in idx_list:
        win = z <= zbuf[idx]
        widx = jnp.where(win, idx, npix)
        img = img.at[widx].set(colors)

    depth_map = zbuf[:npix].reshape(height, width)
    mask = (depth_map < _FAR).astype(jnp.float32)
    depth_map = jnp.where(mask > 0, depth_map, 0.0)
    return img[:npix].reshape(height, width, 3), depth_map, mask


def lift_video_to_pointcloud(
    frames: jnp.ndarray,  # (f, h, w, 3)
    depths: jnp.ndarray,  # (f, h, w)
    intrinsics: jnp.ndarray,  # (f, 3, 3)
    c2ws: jnp.ndarray,  # (f, 4, 4)
):
    """Lift a whole clip into one world-space cloud
    (reference autoregressive_global.py:54-81)."""
    pts, cols = jax.vmap(lift_to_pointcloud)(frames, depths, intrinsics, c2ws)
    return pts.reshape(-1, 3), cols.reshape(-1, 3)


class GlobalPointCloudWarper:
    """Facade matching the reference class (warper_point_cloud.py)."""

    def lift_to_3d_pointcloud(self, frame, depth, intrinsic, c2w):
        return lift_to_pointcloud(frame, depth, intrinsic, c2w)

    def merge_pointclouds(self, points_list, colors_list):
        return merge_pointclouds(points_list, colors_list)

    def downsample_pointcloud(self, points, colors, num_samples, key, weights=None):
        return downsample_pointcloud(points, colors, num_samples, key, weights)

    def render_from_camera(self, points, colors, intrinsic, w2c, height, width,
                           point_size: int = 1):
        return render_zbuffer(points, colors, intrinsic, w2c, height, width,
                              point_size=point_size)
