"""Known-pose pipeline helpers + config override tests."""

import numpy as np

from trajectorycrafter_tpu.config import TrajCrafterConfig, flatten_overrides
from trajectorycrafter_tpu.known_poses import (
    CalibratedCamera,
    panoptic_to_camera,
    undistort_and_resize,
)


def test_calibrated_camera_roundtrip():
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    cam = CalibratedCamera(K=np.eye(3), R=R, t=np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(cam.w2c @ cam.c2w, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(cam.w2c[:3, :3], R)


def test_panoptic_conversion_units():
    calib = {"K": np.eye(3).tolist(), "R": np.eye(3).tolist(),
             "t": [[100.0], [200.0], [300.0]], "distCoef": None}
    cam = panoptic_to_camera(calib)
    np.testing.assert_allclose(cam.t, [1.0, 2.0, 3.0])  # cm -> m
    assert cam.dist_coef is None


def test_undistort_resize_scales_intrinsics(rng):
    frames = rng.uniform(0, 1, (2, 40, 60, 3)).astype(np.float32)
    K = np.array([[100.0, 0, 30], [0, 100.0, 20], [0, 0, 1]])
    cam = CalibratedCamera(K=K, R=np.eye(3), t=np.zeros(3))
    out, K2 = undistort_and_resize(frames, cam, (20, 30))
    assert out.shape == (2, 20, 30, 3)
    np.testing.assert_allclose(K2[0, 0], 50.0)
    np.testing.assert_allclose(K2[1, 1], 50.0)


def test_flatten_overrides():
    cfg = TrajCrafterConfig()
    flatten_overrides(cfg, [
        "video_length=17",
        "render.radius_scale=2.5",
        "diffusion.sample_size=96,160",
        "render.mask=true",
        "diffusion.prompt=hello world",
    ])
    assert cfg.video_length == 17
    assert cfg.render.radius_scale == 2.5
    assert cfg.diffusion.sample_size == (96, 160)
    assert cfg.render.mask is True
    assert cfg.diffusion.prompt == "hello world"
