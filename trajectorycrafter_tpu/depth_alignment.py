"""Consistent-depth optimization (SURVEY 2.17).

TPU-native rebuild of notebooks/12_11_25_consistent_depth/: test-time
optimization that aligns estimated video depth to rendered/warped reference
depth with scale-shift-invariant and temporal-alignment-error (TAE) losses
(consistent_depth.py:34-46, depth_losses.py), windowed over the video
(INFER_LEN=32, OVERLAP=10 defaults, consistent_depth.py:43-47), and an
autoregressive loop that glues aligned depth into the global point cloud
(autoregressive_loop_alignment.py:17-44).

The reference optimises per-window with torch Adam; here the whole windowed
alignment is jit-compiled optax with ``lax.scan`` over optimisation steps.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

INFER_LEN = 32
OVERLAP = 10


class AlignParams(NamedTuple):
    log_scale: jnp.ndarray  # (F,) per-frame log scale
    shift: jnp.ndarray  # (F,) per-frame shift


def scale_shift_invariant_loss(pred: jnp.ndarray, target: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """SSI depth loss in disparity space (Midas-style)."""
    eps = 1e-6
    d_p = 1.0 / jnp.maximum(pred, eps)
    d_t = 1.0 / jnp.maximum(target, eps)
    w = mask / jnp.maximum(mask.sum(axis=(-2, -1), keepdims=True), 1.0)
    mu_p = (w * d_p).sum(axis=(-2, -1), keepdims=True)
    mu_t = (w * d_t).sum(axis=(-2, -1), keepdims=True)
    s_p = (w * jnp.abs(d_p - mu_p)).sum(axis=(-2, -1), keepdims=True) + eps
    s_t = (w * jnp.abs(d_t - mu_t)).sum(axis=(-2, -1), keepdims=True) + eps
    return jnp.mean(jnp.sum(w * jnp.abs((d_p - mu_p) / s_p - (d_t - mu_t) / s_t),
                            axis=(-2, -1)))


def temporal_alignment_error(depth: jnp.ndarray) -> jnp.ndarray:
    """TAE: mean relative frame-to-frame depth change (lower = smoother)."""
    eps = 1e-6
    rel = jnp.abs(depth[1:] - depth[:-1]) / jnp.maximum(depth[:-1], eps)
    return jnp.mean(rel)


def apply_alignment(depth: jnp.ndarray, params: AlignParams) -> jnp.ndarray:
    scale = jnp.exp(params.log_scale)[:, None, None]
    return depth * scale + params.shift[:, None, None]


@partial(jax.jit, static_argnames=("steps", "ssi_weight"))
def align_window(
    depth: jnp.ndarray,  # (F, H, W) estimated depth
    ref_depth: jnp.ndarray,  # (F, H, W) rendered/warped reference depth
    mask: jnp.ndarray,  # (F, H, W) validity of ref_depth
    steps: int = 200,
    lr: float = 0.05,
    tae_weight: float = 0.1,
    ssi_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimise per-frame (scale, shift) so depth matches ref where valid and
    stays temporally smooth -> (aligned_depth, final_loss).

    ``ssi_weight`` adds the scale-shift-invariant disparity term on top of
    the masked L1 (reference uses both, depth_losses.py)."""
    f = depth.shape[0]
    params = AlignParams(jnp.zeros((f,)), jnp.zeros((f,)))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        aligned = apply_alignment(depth, p)
        data = jnp.sum(mask * jnp.abs(aligned - ref_depth)) / jnp.maximum(mask.sum(), 1.0)
        loss = data + tae_weight * temporal_alignment_error(aligned)
        if ssi_weight > 0.0:
            loss = loss + ssi_weight * scale_shift_invariant_loss(
                aligned, ref_depth, mask)
        return loss

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=steps)
    return apply_alignment(depth, params), losses[-1]


def estimate_depth_with_alignment(
    depths: np.ndarray,  # (F, H, W) raw estimated depth for the whole video
    ref_depths: np.ndarray,  # (F, H, W) reference (rendered) depth
    ref_masks: np.ndarray,  # (F, H, W)
    infer_len: int = INFER_LEN,
    overlap: int = OVERLAP,
    steps: int = 200,
) -> np.ndarray:
    """Windowed alignment over an arbitrary-length video
    (reference consistent_depth.py:236-...): consecutive windows share
    ``overlap`` frames whose alignment is ramp-blended."""
    f = depths.shape[0]
    infer_len = min(infer_len, f)
    stride = max(infer_len - overlap, 1)
    starts = list(range(0, max(f - infer_len, 0) + 1, stride))
    if starts[-1] + infer_len < f:
        starts.append(f - infer_len)

    out = np.zeros_like(depths)
    weight = np.zeros((f, 1, 1), np.float32)
    prev_start = None
    for s in starts:
        aligned, _ = align_window(
            jnp.asarray(depths[s : s + infer_len]),
            jnp.asarray(ref_depths[s : s + infer_len]),
            jnp.asarray(ref_masks[s : s + infer_len]),
            steps=steps,
        )
        # positional overlap (the tail catch-up window overlaps more than
        # ``overlap`` frames)
        ov = 0
        if prev_start is not None:
            ov = min(max(prev_start + infer_len - s, 0), infer_len)
        ramp = np.ones((infer_len, 1, 1), np.float32)
        if ov > 0:
            ramp[:ov, 0, 0] = np.linspace(0, 1, ov + 2)[1:-1]
        out[s : s + infer_len] += np.asarray(aligned) * ramp
        weight[s : s + infer_len] += ramp
        prev_start = s
    return out / np.maximum(weight, 1e-8)


def align_video_to_pointcloud(
    frames: np.ndarray,  # (F, H, W, 3)
    depths: np.ndarray,  # (F, H, W) raw estimates
    intrinsics: np.ndarray,  # (F, 3, 3)
    c2ws: np.ndarray,  # (F, 4, 4)
    points: jnp.ndarray,
    colors: jnp.ndarray,
    steps: int = 200,
):
    """Render the global cloud into each camera, align the estimated depth to
    the rendered depth, and return (aligned_depths, new cloud contribution)
    (reference autoregressive_loop_alignment.py:455-631)."""
    from trajectorycrafter_tpu.geometry.pointcloud import (
        lift_video_to_pointcloud,
        render_zbuffer,
    )

    f, h, w = depths.shape
    ref_d, ref_m = [], []
    for i in range(f):
        w2c = jnp.linalg.inv(jnp.asarray(c2ws[i]))
        _, d, m = render_zbuffer(points, colors, jnp.asarray(intrinsics[i]),
                                 w2c, h, w)
        ref_d.append(np.asarray(d))
        ref_m.append(np.asarray(m))
    aligned = estimate_depth_with_alignment(
        depths, np.stack(ref_d), np.stack(ref_m), steps=steps
    )
    new_pts, new_cols = lift_video_to_pointcloud(
        jnp.asarray(frames), jnp.asarray(aligned),
        jnp.asarray(intrinsics), jnp.asarray(c2ws),
    )
    return aligned, (new_pts, new_cols)
