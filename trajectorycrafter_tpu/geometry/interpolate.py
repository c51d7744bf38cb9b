"""Smooth camera-path interpolation: quaternion SLERP poses + intrinsics.

Port of the reference's smooth known-pose variant
(/root/reference/run_w_cam_poses_mvtracker_smooth.py:176-366):
``interpolate_camera_poses`` (SLERP rotations + lerp translations over
num_steps, :176-224), ``interpolate_intrinsics`` (lerp fx/fy/cx/cy, :226-256),
``slerp_quaternions`` (shortest-path, lerp fallback when nearly parallel,
:343-366) and the rotation<->quaternion conversions (:287-341).

TPU-first design: instead of the reference's per-step Python loop with
branching matrix->quaternion cases, everything here is vectorised over the
step axis and branchless (4-candidate quaternion extraction selected with
``where``), so the whole path is jit-compatible and produces the (n, 4, 4)
pose stack in one fused program.
"""

from __future__ import annotations

import jax.numpy as jnp


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z], (..., 3, 3) -> (..., 4).

    Branchless form of the standard 4-case Shepperd extraction
    (reference run_w_cam_poses_mvtracker_smooth.py:287-316): compute all four
    candidate quaternions (each numerically stable when its own pivot term is
    the largest) and select by the largest pivot.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # squared pivots 4w^2, 4x^2, 4y^2, 4z^2 (clamped; >=1 of them is >= 1)
    qw2 = jnp.maximum(1.0 + m00 + m11 + m22, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    def safe(s):
        return jnp.where(s > 0.0, s, 1.0)

    sw, sx = 2.0 * jnp.sqrt(safe(qw2)), 2.0 * jnp.sqrt(safe(qx2))
    sy, sz = 2.0 * jnp.sqrt(safe(qy2)), 2.0 * jnp.sqrt(safe(qz2))

    cand = jnp.stack([
        jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw,
                   (m10 - m01) / sw], -1),
        jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx,
                   (m02 + m20) / sx], -1),
        jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy,
                   (m12 + m21) / sy], -1),
        jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz,
                   0.25 * sz], -1),
    ], -2)  # (..., 4 candidates, 4)
    pick = jnp.argmax(jnp.stack([qw2, qx2, qy2, qz2], -1), axis=-1)
    q = jnp.take_along_axis(cand, pick[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w, x, y, z] -> rotation matrix, (..., 4) -> (..., 3, 3)
    (reference run_w_cam_poses_mvtracker_smooth.py:318-341)."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, alphas: jnp.ndarray) -> jnp.ndarray:
    """Shortest-path spherical interpolation between two quaternions,
    vectorised over ``alphas`` (n,) -> (n, 4)
    (reference run_w_cam_poses_mvtracker_smooth.py:343-366: negate the far
    hemisphere, fall back to normalised lerp when |dot| > 0.9995).
    """
    q0 = jnp.asarray(q0, jnp.float32)
    q1 = jnp.asarray(q1, jnp.float32)
    alphas = jnp.asarray(alphas, jnp.float32)
    dot = jnp.sum(q0 * q1)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)

    # lerp fallback (nearly parallel: sin(theta) -> 0)
    lerped = q0[None] + alphas[:, None] * (q1 - q0)[None]
    lerped = lerped / jnp.linalg.norm(lerped, axis=-1, keepdims=True)

    theta0 = jnp.arccos(jnp.clip(dot, 0.0, 1.0))
    sin0 = jnp.maximum(jnp.sin(theta0), 1e-12)
    theta = theta0 * alphas
    s0 = jnp.cos(theta) - dot * jnp.sin(theta) / sin0
    s1 = jnp.sin(theta) / sin0
    slerped = s0[:, None] * q0[None] + s1[:, None] * q1[None]

    return jnp.where(dot > 0.9995, lerped, slerped)


def interpolate_poses(source: jnp.ndarray, target: jnp.ndarray,
                      num_steps: int) -> jnp.ndarray:
    """(4, 4), (4, 4) -> (num_steps, 4, 4): SLERP the rotation block, lerp the
    translation, endpoints exactly the inputs
    (reference run_w_cam_poses_mvtracker_smooth.py:176-224; alpha grid
    i/(n-1) with the single-step edge case at :200).
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if num_steps > 1:
        alphas = jnp.linspace(0.0, 1.0, num_steps)
    else:
        alphas = jnp.zeros((num_steps,), jnp.float32)
    q = slerp(mat_to_quat(source[:3, :3]), mat_to_quat(target[:3, :3]), alphas)
    R = quat_to_mat(q)  # (n, 3, 3)
    t = (1.0 - alphas)[:, None] * source[:3, 3][None] \
        + alphas[:, None] * target[:3, 3][None]
    out = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (num_steps, 1, 1))
    out = out.at[:, :3, :3].set(R)
    out = out.at[:, :3, 3].set(t)
    return out


def interpolate_intrinsics(source_K: jnp.ndarray, target_K: jnp.ndarray,
                           num_steps: int) -> jnp.ndarray:
    """(3, 3), (3, 3) -> (num_steps, 3, 3) linear interpolation
    (reference run_w_cam_poses_mvtracker_smooth.py:226-256)."""
    source_K = jnp.asarray(source_K, jnp.float32)
    target_K = jnp.asarray(target_K, jnp.float32)
    if num_steps > 1:
        alphas = jnp.linspace(0.0, 1.0, num_steps)
    else:
        alphas = jnp.zeros((num_steps,), jnp.float32)
    return (1.0 - alphas)[:, None, None] * source_K[None] \
        + alphas[:, None, None] * target_K[None]
