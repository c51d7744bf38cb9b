"""Tests for the global point-cloud z-buffer renderer (loop-based golden)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.geometry.pointcloud import (
    downsample_pointcloud,
    lift_to_pointcloud,
    lift_video_to_pointcloud,
    render_zbuffer,
)


def golden_render(points, colors, K, w2c, h, w):
    """Scalar re-derivation of the reference z-buffer semantics
    (warper_point_cloud.py:471-486): validity on the unrounded coords and
    z > 0.01, winner coords rounded then clamped into the frame."""
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    proj = cam @ K.T
    z = proj[:, 2]
    xf = proj[:, 0] / z
    yf = proj[:, 1] / z
    x = np.clip(np.round(xf), 0, w - 1).astype(int)
    y = np.clip(np.round(yf), 0, h - 1).astype(int)
    img = np.zeros((h, w, 3), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    for i in np.argsort(-z):  # far to near: near overwrites
        if (z[i] > 0.01 and 0 <= xf[i] < w and 0 <= yf[i] < h
                and z[i] <= zbuf[y[i], x[i]]):
            zbuf[y[i], x[i]] = z[i]
            img[y[i], x[i]] = colors[i]
    mask = np.isfinite(zbuf).astype(np.float32)
    zout = np.where(mask > 0, zbuf, 0.0)
    return img, zout, mask


def test_lift_roundtrip(rng):
    """Unproject + reproject with the same camera returns the pixel grid."""
    h, w = 8, 10
    depth = rng.uniform(1, 4, (h, w)).astype(np.float32)
    frame = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    pts, cols = lift_to_pointcloud(jnp.asarray(frame), jnp.asarray(depth),
                                   jnp.asarray(K), jnp.asarray(c2w))
    proj = np.asarray(pts) @ K.T
    xy = proj[:, :2] / proj[:, 2:3]
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(xy[:, 0], gx.reshape(-1), atol=1e-4)
    np.testing.assert_allclose(xy[:, 1], gy.reshape(-1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cols), frame.reshape(-1, 3))


def test_zbuffer_matches_golden(rng):
    h, w, n = 12, 16, 400
    points = rng.uniform([-2, -2, 1], [2, 2, 6], (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    img, depth, mask = render_zbuffer(
        jnp.asarray(points), jnp.asarray(colors), jnp.asarray(K),
        jnp.asarray(w2c), h, w,
    )
    gimg, gdepth, gmask = golden_render(points, colors, K, w2c, h, w)
    np.testing.assert_allclose(np.asarray(mask), gmask)
    np.testing.assert_allclose(np.asarray(depth), gdepth, rtol=1e-5)
    # winner colors must match wherever the z-winner is unique
    diff = np.abs(np.asarray(img) - gimg).max(axis=-1)
    assert (diff < 1e-5).mean() > 0.99


def test_zbuffer_occlusion_order():
    """A nearer point must occlude a farther one at the same pixel."""
    K = np.array([[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 2.0], [0, 0, 4.0]], np.float32)  # both -> pixel (2,2)
    cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    img, depth, mask = render_zbuffer(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(K),
        jnp.asarray(np.eye(4, dtype=np.float32)), 5, 5,
    )
    np.testing.assert_allclose(np.asarray(img[2, 2]), [1, 0, 0])
    assert float(depth[2, 2]) == 2.0
    assert float(mask.sum()) == 1.0


def test_point_size_splat():
    K = np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 2.0]], np.float32)
    cols = np.array([[1, 1, 1]], np.float32)
    img, depth, mask = render_zbuffer(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(K),
        jnp.asarray(np.eye(4, dtype=np.float32)), 9, 9, point_size=3,
    )
    assert float(mask.sum()) == 9.0  # 3x3 neighbourhood filled


def test_behind_camera_culled():
    K = np.array([[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, -1.0], [0, 0, 0.005]], np.float32)  # cull at z<=0.01
    cols = np.ones((2, 3), np.float32)
    img, depth, mask = render_zbuffer(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(K),
        jnp.asarray(np.eye(4, dtype=np.float32)), 5, 5,
    )
    assert float(mask.sum()) == 0.0


@pytest.mark.slow
def test_lift_video_and_downsample(rng):
    f, h, w = 3, 6, 8
    frames = rng.uniform(0, 1, (f, h, w, 3)).astype(np.float32)
    depths = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    K = np.tile(np.array([[10.0, 0, 4], [0, 10.0, 3], [0, 0, 1]], np.float32), (f, 1, 1))
    c2ws = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    pts, cols = lift_video_to_pointcloud(
        jnp.asarray(frames), jnp.asarray(depths), jnp.asarray(K), jnp.asarray(c2ws))
    assert pts.shape == (f * h * w, 3)
    p2, c2 = downsample_pointcloud(pts, cols, 50, jax.random.PRNGKey(0))
    assert p2.shape == (50, 3) and c2.shape == (50, 3)
