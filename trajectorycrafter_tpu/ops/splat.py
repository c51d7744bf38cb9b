"""Forward-splat warping as vectorised XLA scatter.

TPU-native re-expression of the reference's CPU splatting loop
(/root/reference/models/utils.py:220-583): the per-frame Python loop with
``index_put_(accumulate=True)`` becomes a single jit program with ONE
scatter-add over a padded accumulation grid -- the four bilinear corners
and the value/weight channels all fused into one wide payload row per
source pixel -- vmapped over all frames at once.  Everything is
static-shaped fp32.

Algorithm (bit-matching the reference maths):
  1. unproject pixel grid with K1^-1 * depth, transform by T2 @ T1^-1,
     project with K2; points behind the camera (z <= 0.01) get depth 1000
     (models/utils.py:350-420).
  2. flow = projected_xy / z - pixel_grid.
  3. bilinear splatting: each source pixel scatters into the 4 neighbouring
     target pixels with bilinear proximity weights divided by soft z-buffer
     weights  exp(log1p(d) / max(log1p(d)) * 50)  (models/utils.py:422-583).
  4. weight-normalise; mask = accumulated weight > 0.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BEHIND_EPS = 0.01
_BEHIND_FILL = 1000.0
_DEPTH_SAT = 1000.0
_ZWEIGHT_SCALE = 50.0


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) pixel coordinates."""
    x = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    y = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    return jnp.stack([x, y], axis=-1)


def transform_points(
    depth: jnp.ndarray,  # (h, w)
    transformation1: jnp.ndarray,  # (4, 4) source extrinsic
    transformation2: jnp.ndarray,  # (4, 4) target extrinsic
    intrinsic1: jnp.ndarray,  # (3, 3)
    intrinsic2: Optional[jnp.ndarray] = None,  # (3, 3)
) -> jnp.ndarray:
    """Reproject each pixel into the target camera -> (h, w, 3) K2-space points."""
    if intrinsic2 is None:
        intrinsic2 = intrinsic1
    h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)
    ones = jnp.ones((h, w, 1), depth.dtype)
    pix = jnp.concatenate([grid, ones], axis=-1)  # (h, w, 3) homogeneous

    # geometry is fp32-critical: force full-precision matmuls even on TPU
    with jax.default_matmul_precision("highest"):
        transformation = transformation2 @ jnp.linalg.inv(transformation1)
        k1_inv = jnp.linalg.inv(intrinsic1)

    # The per-pixel projections are written as EXPLICIT mul/add chains, not
    # dots: XLA keeps written addition order but freely reassociates dot
    # reductions, and a 1-ulp coordinate difference between two compilations
    # (e.g. sharded vs not) flips bilinear corners / knife-edge soft-z blends
    # into O(1) output changes.  Same math as pix @ K1^-T etc.
    def apply3(m, v, t=None):
        out = [v[..., 0] * m[i, 0] + v[..., 1] * m[i, 1] + v[..., 2] * m[i, 2]
               for i in range(3)]
        if t is not None:
            out = [o + t[i] for i, o in enumerate(out)]
        return jnp.stack(out, axis=-1)

    rays = apply3(k1_inv, pix)  # (h, w, 3)
    cam_points = rays * depth[..., None]  # (h, w, 3) in source camera space
    world = apply3(transformation[:3, :3], cam_points, transformation[:3, 3])
    projected = apply3(intrinsic2, world)  # (h, w, 3)

    behind = world[..., 2:3] <= _BEHIND_EPS
    return jnp.where(behind, jnp.full_like(projected, _BEHIND_FILL), projected)


def _splat_weights(trans_pos: jnp.ndarray, h: int, w: int):
    """Floor-corner indices + per-slot proximity weights on the padded grid.

    Mirrors the reference exactly, including ceil (not floor+1) so that
    integer landing positions contribute through all four corners
    (models/utils.py:452-488).  Returns (fyi, fxi, (w00, w01, w10, w11))
    where slot (dy, dx) contributes to target cell (fyi+dy, fxi+dx).
    """
    pos = trans_pos + 1.0  # shift into padded grid
    floor = jnp.floor(pos)
    ceil = jnp.ceil(pos)
    pos_x = jnp.clip(pos[..., 0], 0.0, w + 1.0)
    pos_y = jnp.clip(pos[..., 1], 0.0, h + 1.0)
    fx = jnp.clip(floor[..., 0], 0.0, w + 1.0)
    fy = jnp.clip(floor[..., 1], 0.0, h + 1.0)
    cx = jnp.clip(ceil[..., 0], 0.0, w + 1.0)
    cy = jnp.clip(ceil[..., 1], 0.0, h + 1.0)

    px_f = 1.0 - (pos_x - fx)
    px_c = 1.0 - (cx - pos_x)
    py_f = 1.0 - (pos_y - fy)
    py_c = 1.0 - (cy - pos_y)

    fxi, fyi = fx.astype(jnp.int32), fy.astype(jnp.int32)
    cxi, cyi = cx.astype(jnp.int32), cy.astype(jnp.int32)

    # The four corner scatters are fused into ONE scatter row per source
    # pixel (scatter cost on TPU is per-row-bound -- measured ~11M rows/s
    # regardless of payload width, docs/COVERAGE.md).  The ceil corner is
    # almost always floor+1; when it degenerates (integer landing position,
    # or both ends clipped to the same border cell) its proximity weight
    # folds into the floor slot.  The separable prox weights make the fold
    # exact: sum over corners of py_*px_* factors as (py_f+py_c)(px_f+px_c).
    deg_x = cxi == fxi
    deg_y = cyi == fyi
    px0 = px_f + jnp.where(deg_x, px_c, 0.0)
    px1 = jnp.where(deg_x, 0.0, px_c)
    py0 = py_f + jnp.where(deg_y, py_c, 0.0)
    py1 = jnp.where(deg_y, 0.0, py_c)
    # slot weights: (row offset, col offset) in {0,1}^2 relative to (fy, fx)
    slots = (py0 * px0, py0 * px1, py1 * px0, py1 * px1)
    return fyi, fxi, slots


def bilinear_splat(
    values: jnp.ndarray,  # (h, w, c) channel-last source values
    mask: Optional[jnp.ndarray],  # (h, w) 1=known, or None
    depth: jnp.ndarray,  # (h, w) target-view depth for z-weighting
    flow: jnp.ndarray,  # (h, w, 2) source->target pixel flow
    flow_mask: Optional[jnp.ndarray] = None,  # (h, w)
    is_image: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softly z-buffered bilinear forward splat -> (warped (h,w,c), mask (h,w)).

    ``is_image=True`` clips the normalised output to [-1, 1] and uses -1 as
    the hole fill value (reference models/utils.py:571-583).
    """
    h, w, c = values.shape
    if mask is None:
        mask = jnp.ones((h, w), values.dtype)
    if flow_mask is None:
        flow_mask = jnp.ones((h, w), values.dtype)

    trans_pos = flow + pixel_grid(h, w, values.dtype)
    fyi, fxi, slots = _splat_weights(trans_pos, h, w)

    sat_depth = jnp.clip(depth, 0.0, _DEPTH_SAT)
    log_depth = jnp.log1p(sat_depth)
    depth_weights = jnp.exp(log_depth / jnp.max(log_depth) * _ZWEIGHT_SCALE)
    base_w = mask * flow_mask / depth_weights  # (h, w)

    # Fuse value and weight channels into one scatter payload: (h*w, c+1),
    # then fuse the four bilinear corners into ONE row of 4*(c+1) channels.
    # Slot k of row (fy, fx) is the contribution to target cell
    # (fy + k//2, fx + k%2); neighbours are recombined by shifted slices
    # after the scatter.  One scatter row per source pixel instead of four.
    payload = jnp.concatenate([values, jnp.ones((h, w, 1), values.dtype)], -1)
    payload = payload.reshape(h * w, 1, c + 1)
    sw = jnp.stack([s * base_w for s in slots], axis=-1).reshape(h * w, 4, 1)

    # padded grid (h+3, w+3): fyi/fxi reach h+1/w+1 and slots add one more
    acc = jnp.zeros(((h + 3) * (w + 3), 4 * (c + 1)), values.dtype)
    flat = (fyi * (w + 3) + fxi).reshape(h * w)
    acc = acc.at[flat].add((payload * sw).reshape(h * w, 4 * (c + 1)))

    acc = acc.reshape(h + 3, w + 3, 4, c + 1)
    # recombine: out[y, x] = slot0[y, x] + slot1[y, x-1] + slot2[y-1, x]
    #            + slot3[y-1, x-1], cropped to the unpadded interior
    acc = (acc[1:h + 1, 1:w + 1, 0] + acc[1:h + 1, 0:w, 1]
           + acc[0:h, 1:w + 1, 2] + acc[0:h, 0:w, 3])
    warped, weights = acc[..., :c], acc[..., c:]

    known = weights > 0
    fill = -1.0 if is_image else 0.0
    out = jnp.where(known, warped / jnp.where(known, weights, 1.0), fill)
    if is_image:
        out = jnp.clip(out, -1.0, 1.0)
    return out, known[..., 0].astype(values.dtype)


def forward_warp_single(
    frame: jnp.ndarray,  # (h, w, 3) in [-1, 1]
    mask: Optional[jnp.ndarray],  # (h, w) or None
    depth: jnp.ndarray,  # (h, w)
    transformation1: jnp.ndarray,  # (4, 4)
    transformation2: jnp.ndarray,  # (4, 4)
    intrinsic1: jnp.ndarray,  # (3, 3)
    intrinsic2: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-frame forward warp (reference Warper.forward_warp, twice=False).

    Returns (warped_frame (h,w,3), mask (h,w), warped_depth (h,w), flow (h,w,2)).
    """
    h, w = depth.shape
    pts = transform_points(depth, transformation1, transformation2, intrinsic1, intrinsic2)
    coords = pts[..., :2] / pts[..., 2:3]
    trans_depth = pts[..., 2]
    flow = coords - pixel_grid(h, w, depth.dtype)

    # ONE fused splat for [frame | depth]: the two splats share indices and
    # weights, and scatter rows dominate the warp cost on TPU (measured 2x:
    # 19.6 -> 10.2 s for 49 frames at 576x1024), so halving the scatter count
    # halves the stage.  Identical math to two bilinear_splat calls.
    both, mask2 = bilinear_splat(
        jnp.concatenate([frame, trans_depth[..., None]], axis=-1),
        mask, trans_depth, flow, None, is_image=False,
    )
    known = mask2 > 0
    warped = jnp.where(known[..., None], jnp.clip(both[..., :3], -1.0, 1.0), -1.0)
    warped_depth = both[..., 3]
    return warped, mask2, warped_depth, flow


def forward_warp_batch(
    frames: jnp.ndarray,  # (n, h, w, 3)
    depths: jnp.ndarray,  # (n, h, w)
    pose_s: jnp.ndarray,  # (n, 4, 4)
    pose_t: jnp.ndarray,  # (n, 4, 4)
    intrinsics1: jnp.ndarray,  # (n, 3, 3)
    intrinsics2: Optional[jnp.ndarray] = None,  # (n, 3, 3)
    use_mask_clean: bool = False,
    mesh=None,
):
    """Warp all frames of a clip in one jit call (replaces the reference's
    49-iteration host loop, demo.py:77-90).

    ``mesh``: shard the (independent) frames over EVERY mesh axis — the
    splat has no batch/tensor dimension to reserve, so all devices take a
    frame slice (GSPMD pads internally when n doesn't divide)."""
    if intrinsics2 is None:
        intrinsics2 = intrinsics1
    if mesh is None:
        return _forward_warp_batch_jit(frames, depths, pose_s, pose_t,
                                       intrinsics1, intrinsics2,
                                       use_mask_clean, shard=False)
    with jax.set_mesh(mesh):
        return _forward_warp_batch_jit(frames, depths, pose_s, pose_t,
                                       intrinsics1, intrinsics2,
                                       use_mask_clean, shard=True)


@partial(jax.jit, static_argnames=("use_mask_clean", "shard"))
def _forward_warp_batch_jit(frames, depths, pose_s, pose_t, intrinsics1,
                            intrinsics2, use_mask_clean, shard=False):
    if shard:
        from trajectorycrafter_tpu.parallel.sharding import constrain

        axes = ("dp", "sp", "tp")
        cons = lambda x: constrain(x, axes, *([None] * (x.ndim - 1)))
        frames, depths, pose_s, pose_t, intrinsics1, intrinsics2 = map(
            cons, (frames, depths, pose_s, pose_t, intrinsics1, intrinsics2))
    warp = jax.vmap(forward_warp_single, in_axes=(0, None, 0, 0, 0, 0, 0))
    warped, masks, wdepth, flow = warp(
        frames, None, depths, pose_s, pose_t, intrinsics1, intrinsics2
    )
    if use_mask_clean:
        from trajectorycrafter_tpu.ops.morphology import clean_mask_batch

        warped, masks = clean_mask_batch(warped, masks)
    return warped, masks, wdepth, flow
