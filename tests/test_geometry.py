"""Tests for camera math and trajectory synthesis.

The golden model for sphere2pose is an independent numpy implementation of the
published spherical camera parametrisation (translate then rotate,
left-multiplied world-axis rotations).
"""

import numpy as np
import jax.numpy as jnp

from trajectorycrafter_tpu.geometry.cameras import (
    default_c2w,
    intrinsics_matrix,
    sphere2pose,
    zoom_intrinsics,
)
from trajectorycrafter_tpu.geometry.trajectory import (
    generate_traj_specified,
    generate_traj_txt,
    txt_interpolation,
)


def golden_sphere2pose(c2w, theta, phi, r, x=None, y=None):
    c2w = np.array(c2w, np.float64).copy()
    c2w[2, 3] -= r
    if x is not None:
        c2w[1, 3] += y
    if y is not None:
        c2w[0, 3] -= x
    th, ph = np.deg2rad(theta), np.deg2rad(phi)
    rx = np.array(
        [[1, 0, 0, 0],
         [0, np.cos(th), -np.sin(th), 0],
         [0, np.sin(th), np.cos(th), 0],
         [0, 0, 0, 1]])
    ry = np.array(
        [[np.cos(ph), 0, np.sin(ph), 0],
         [0, 1, 0, 0],
         [-np.sin(ph), 0, np.cos(ph), 0],
         [0, 0, 0, 1]])
    return ry @ rx @ c2w


def test_sphere2pose_matches_golden():
    c2w = np.asarray(default_c2w())
    for theta, phi, r, x, y in [(0, 0, 0, 0, 0), (30, -45, 1.5, 0.2, -0.1), (-10, 80, 0.3, 0, 0)]:
        got = np.asarray(sphere2pose(jnp.asarray(c2w), theta, phi, r, x, y))
        want = golden_sphere2pose(c2w, theta, phi, r, x, y)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_sphere2pose_batched():
    c2w = default_c2w()
    thetas = jnp.linspace(0.0, 30.0, 5)
    phis = jnp.linspace(0.0, -20.0, 5)
    rs = jnp.linspace(0.0, 1.0, 5)
    out = sphere2pose(c2w, thetas, phis, rs, jnp.zeros(5), jnp.zeros(5))
    assert out.shape == (5, 4, 4)
    for i, (th, ph, r) in enumerate(zip(thetas, phis, rs)):
        want = golden_sphere2pose(np.asarray(c2w), float(th), float(ph), float(r), 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=1e-5)


def test_generate_traj_specified_endpoints():
    c2w = default_c2w()
    poses = generate_traj_specified(c2w, 30.0, -45.0, 0.5, 0.1, -0.2, 49)
    assert poses.shape == (49, 4, 4)
    np.testing.assert_allclose(
        np.asarray(poses[0]), golden_sphere2pose(np.asarray(c2w), 0, 0, 0, 0, 0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(poses[-1]),
        golden_sphere2pose(np.asarray(c2w), 30.0, -45.0, 0.5, 0.1, -0.2),
        atol=1e-5,
    )


def test_txt_interpolation_linear_two_knots():
    out = txt_interpolation([0.0, 10.0], 11, mode="linear")
    np.testing.assert_allclose(out, np.linspace(0, 10, 11), atol=1e-9)


def test_generate_traj_txt_loop_fixture():
    """Parse-and-generate with the reference repo's fixture knots."""
    theta = [0, 2, 10, 15, 12, 6, 0, -2, -5, -12, -8, -3, 0]
    phi = [0, -3, -10, -20, -30, -25, -17, -10, 0]
    r = [0, 0.02, 0.09, 0.16, 0.25, 0.2, 0.09, 0]
    poses = generate_traj_txt(default_c2w(), phi, theta, r, 49)
    assert poses.shape == (49, 4, 4)
    assert np.all(np.isfinite(np.asarray(poses)))
    # endpoints pinned for >3-knot sequences
    np.testing.assert_allclose(
        np.asarray(poses[0]), golden_sphere2pose(np.asarray(default_c2w()), 0, 0, 0), atol=1e-5
    )


def test_intrinsics():
    K = np.asarray(intrinsics_matrix(500.0, 512.0, 288.0))
    assert K.shape == (3, 3)
    np.testing.assert_allclose(K, [[500, 0, 512], [0, 500, 288], [0, 0, 1]])
    Ks = np.asarray(zoom_intrinsics(500.0, 250.0, 49, 512.0, 288.0))
    assert Ks.shape == (49, 3, 3)
    np.testing.assert_allclose(Ks[0, 0, 0], 500.0)
    np.testing.assert_allclose(Ks[-1, 0, 0], 250.0)
    np.testing.assert_allclose(Ks[:, 2, 2], 1.0)
