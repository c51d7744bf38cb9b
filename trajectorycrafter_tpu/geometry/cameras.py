"""Camera models and spherical pose synthesis.

Pure-JAX port of the camera math in the reference
(/root/reference/models/utils.py:83-131 ``sphere2pose`` and
/root/reference/demo.py:538-586 ``get_poses``).  All functions are
batched/vmappable and jit-friendly (no Python control flow on traced values).

Conventions (identical to the reference):
  * camera-to-world matrices (c2w), right-multiplied homogeneous column points
  * initial camera: c2w0 = diag(-1, 1, -1, 1)  (OpenGL-style flip)
  * spherical parametrisation: translate -r along world z, pan by (x, y),
    then rotate theta about world x and phi about world y (left-multiplied).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def default_c2w(dtype=jnp.float32) -> jnp.ndarray:
    """Initial anchor camera pose, reference demo.py:553-564."""
    return jnp.asarray(
        [
            [-1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=dtype,
    )


def intrinsics_matrix(f, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    """3x3 pinhole intrinsics (reference demo.py:545-552)."""
    f = jnp.asarray(f, dtype)
    cx = jnp.asarray(cx, dtype)
    cy = jnp.asarray(cy, dtype)
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    return jnp.stack(
        [
            jnp.stack([f, zero, cx], -1),
            jnp.stack([zero, f, cy], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def zoom_intrinsics(f0: float, f1: float, num: int, cx: float, cy: float) -> jnp.ndarray:
    """Per-frame focal interpolation for dolly zoom (reference demo.py:588-604)."""
    fs = jnp.linspace(f0, f1, num)
    return intrinsics_matrix(fs, jnp.full((num,), cx), jnp.full((num,), cy))


def _rot_x(theta_rad: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta_rad), jnp.sin(theta_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z, z], -1),
            jnp.stack([z, c, -s, z], -1),
            jnp.stack([z, s, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def _rot_y(phi_rad: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(phi_rad), jnp.sin(phi_rad)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s, z], -1),
            jnp.stack([z, o, z, z], -1),
            jnp.stack([-s, z, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def sphere2pose(c2w, theta_deg, phi_deg, r, x=None, y=None) -> jnp.ndarray:
    """Spherical offset of a camera pose (reference models/utils.py:83-131).

    Accepts a single (4, 4) c2w with scalar or (n,)-vector angles, returning
    (4, 4) or (n, 4, 4); broadcasting follows jnp rules.

    Matches the reference ordering exactly: translate z -= r (and y += y,
    x -= x pans), then left-multiply rot_x(theta) and rot_y(phi).
    """
    theta = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
    phi = jnp.deg2rad(jnp.asarray(phi_deg, jnp.float32))
    r = jnp.asarray(r, jnp.float32)
    batched = theta.ndim > 0
    if batched:
        c2w = jnp.broadcast_to(c2w, (theta.shape[0], 4, 4))

    delta = jnp.zeros(c2w.shape[:-2] + (4, 4), c2w.dtype)
    delta = delta.at[..., 2, 3].add(-r)
    # NB: the reference applies the y-pan when x is given and the x-pan when y
    # is given (models/utils.py:89-92) -- but both are always passed together
    # by every caller, so the net effect is x -= x_pan, y += y_pan.
    if y is not None:
        delta = delta.at[..., 1, 3].add(jnp.asarray(y, jnp.float32))
    if x is not None:
        delta = delta.at[..., 0, 3].add(-jnp.asarray(x, jnp.float32))
    c2w = c2w + delta

    with jax.default_matmul_precision("highest"):
        c2w = _rot_x(theta) @ c2w
        c2w = _rot_y(phi) @ c2w
    return c2w


def pose_radius_from_depth(depth: np.ndarray, radius_scale: float, max_radius: float = 5.0) -> float:
    """Orbit radius = centre-pixel depth of frame 0 x scale, clamped
    (reference demo.py:539-543)."""
    h, w = depth.shape[-2], depth.shape[-1]
    radius = float(np.asarray(depth)[..., h // 2, w // 2].reshape(-1)[0]) * radius_scale
    return min(radius, max_radius)
