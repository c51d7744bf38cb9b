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


# ----------------------------------------------------------------------------
# dataset loaders (DyCheck-iPhone / MVTracker / SOM), fixture-backed
# ----------------------------------------------------------------------------


def _write_iphone_tree(root, sequence="toy", cams=(0, 1), frame_ids=(3, 4, 5, 8),
                       size=(10, 14)):
    """Synthetic DyCheck-iPhone layout (iphone_original_dataset.py:13-17)."""
    import json
    import os

    import cv2

    h, w = size
    seq = os.path.join(root, sequence)
    for sub in ("camera", "rgb/1x", "depth/1x"):
        os.makedirs(os.path.join(seq, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for cam in cams:
        for fid in frame_ids:
            params = {
                "focal_length": 100.0 + cam,
                "principal_point": [w / 2, h / 2],
                "orientation": np.eye(3).tolist(),
                "position": [0.1 * cam, 0.0, 0.0],
            }
            with open(os.path.join(seq, "camera", f"{cam}_{fid:05d}.json"), "w") as f:
                json.dump(params, f)
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            cv2.imwrite(os.path.join(seq, "rgb", "1x", f"{cam}_{fid:05d}.png"), img)
            if cam == 0:
                np.save(os.path.join(seq, "depth", "1x", f"0_{fid:05d}.npy"),
                        rng.uniform(1, 3, (h, w, 1)).astype(np.float32))
    return seq


def test_iphone_loader_contiguous_run(tmp_path):
    from trajectorycrafter_tpu.known_poses import load_iphone_sequence

    _write_iphone_tree(str(tmp_path))
    seq = load_iphone_sequence(str(tmp_path), "toy", camera_ids=(0, 1),
                               min_sequence_length=2)
    # frames 3,4,5 are contiguous; 8 is a separate length-1 run -> dropped
    assert seq.frame_ids == [3, 4, 5]
    assert seq.frames[0].shape == (3, 10, 14, 3)
    assert seq.frames[0].dtype == np.float32
    assert 0.0 <= seq.frames[1].min() and seq.frames[1].max() <= 1.0
    assert seq.depths.shape == (3, 10, 14)  # squeezed from (H, W, 1)
    assert len(seq.cameras[1]) == 3


def test_iphone_camera_math():
    """Net extrinsic = inv([orientation | position])
    (iphone_original_dataset.py:226-253 + run_w_cam_poses_iphone.py:21-33)."""
    from scipy.spatial.transform import Rotation

    from trajectorycrafter_tpu.known_poses import iphone_camera_from_json

    Rm = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    p = np.array([1.0, -2.0, 0.5])
    cam = iphone_camera_from_json({
        "focal_length": 123.0, "principal_point": [7.0, 5.0],
        "orientation": Rm.tolist(), "position": p.tolist(),
    })
    pose = np.eye(4)
    pose[:3, :3] = Rm
    pose[:3, 3] = p
    np.testing.assert_allclose(cam.w2c, np.linalg.inv(pose), atol=1e-12)
    assert cam.K[0, 0] == 123.0 and cam.K[0, 2] == 7.0


def test_iphone_loader_missing_depth_excludes_frame(tmp_path):
    import os

    from trajectorycrafter_tpu.known_poses import load_iphone_sequence

    seq_dir = _write_iphone_tree(str(tmp_path))
    os.remove(os.path.join(seq_dir, "depth", "1x", "0_00004.npy"))
    seq = load_iphone_sequence(str(tmp_path), "toy", camera_ids=(0, 1),
                               min_sequence_length=1)
    assert 4 not in seq.frame_ids


def test_mvtracker_npz_loader(tmp_path):
    from trajectorycrafter_tpu.known_poses import load_mvtracker_npz

    rng = np.random.default_rng(1)
    V, T, H, W = 2, 4, 8, 12
    extrs = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]), (V, T, 1, 1))
    extrs[1, :, :3, 3] = [0.5, 0.0, 0.1]
    path = tmp_path / "sample.npz"
    np.savez(
        path,
        video=(rng.uniform(0, 255, (V, T, 3, H, W))).astype(np.uint8),
        videodepth=rng.uniform(1, 4, (V, T, 1, H, W)).astype(np.float32),
        intrs=np.tile(np.array([[50.0, 0, 6], [0, 50.0, 4], [0, 0, 1]]),
                      (V, T, 1, 1)),
        extrs=extrs,
    )
    s = load_mvtracker_npz(str(path))
    assert s["frames"].shape == (T, H, W, 3)  # channels moved last
    assert s["target_frames"].shape == (T, H, W, 3)
    assert s["frames"].max() <= 1.0  # uint8 -> [0, 1]
    assert s["depths"].shape == (T, H, W)  # (T,1,H,W) squeezed
    np.testing.assert_allclose(s["target_cam"].t, [0.5, 0.0, 0.1])
    np.testing.assert_allclose(s["source_cam"].K[0, 0], 50.0)
    assert s["seq_name"] == "sample"


def test_som_sequence_and_rotation():
    from trajectorycrafter_tpu.known_poses import (
        load_som_sequence,
        rotate_for_aspect,
        som_camera,
    )

    rng = np.random.default_rng(2)
    w2c = np.eye(4)
    w2c[:3, 3] = [0.0, 1.0, 2.0]
    items = [
        {"imgs": rng.uniform(0, 1, (8, 6, 3)).astype(np.float32),
         "depths": rng.uniform(1, 2, (8, 6)).astype(np.float32),
         "Ks": np.array([[40.0, 0, 3], [0, 40.0, 4], [0, 0, 1]]),
         "w2cs": w2c,
         "masks": (rng.uniform(0, 1, (8, 6)) > 0.5).astype(np.float32)}
        for _ in range(3)
    ]
    s = load_som_sequence(items, items)
    assert s["frames"].shape == (3, 8, 6, 3)
    assert s["masks"].shape == (3, 8, 6)
    np.testing.assert_allclose(s["source_cam"].t, [0.0, 1.0, 2.0])  # w2c as-is

    # rotation disabled by default (reference ships should_rotate -> False)
    frames = s["frames"]
    K = items[0]["Ks"]
    out, K2 = rotate_for_aspect(frames, K, (6, 8))
    assert out.shape == frames.shape and np.all(K2 == K)
    # enabled: portrait clip vs landscape target rotates 90 deg clockwise
    out, K2 = rotate_for_aspect(frames, K, (6, 8), enable=True)
    assert out.shape == (3, 6, 8, 3)
    assert K2[0, 2] == K[1, 2] and K2[1, 2] == 6 - 1 - K[0, 2]
    assert K2[0, 0] == K[1, 1] and K2[1, 1] == K[0, 0]
    np.testing.assert_array_equal(out[0], np.rot90(frames[0], k=-1, axes=(0, 1)))


import os

import pytest


@pytest.mark.slow
def test_infer_sample_end_to_end_dev_scale(tmp_path):
    """MVTracker-format sample -> CameraPoseTrajCrafter.infer_sample with the
    dev-scale stack (the reference's run_w_cam_poses_mvtracker.py main path)."""
    from trajectorycrafter_tpu.known_poses import (
        CameraPoseTrajCrafter,
        load_mvtracker_npz,
    )

    rng = np.random.default_rng(3)
    V, T, H, W = 2, 9, 48, 80
    extrs = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]), (V, T, 1, 1))
    extrs[1, :, 0, 3] = 0.2
    path = tmp_path / "kubric.npz"
    np.savez(
        path,
        video=rng.uniform(0, 255, (V, T, 3, H, W)).astype(np.uint8),
        videodepth=rng.uniform(2, 5, (V, T, 1, H, W)).astype(np.float32),
        intrs=np.tile(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]),
                      (V, T, 1, 1)),
        extrs=extrs,
    )
    sample = load_mvtracker_npz(str(path))

    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    cfg.video_length = T
    cfg.warp_size = (H, W)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.num_inference_steps = 2
    cfg.diffusion.prompt = "a scene"
    cfg.save_dir = str(tmp_path / "out")
    os.makedirs(cfg.save_dir, exist_ok=True)

    tc = CameraPoseTrajCrafter(cfg)
    gen = tc.infer_sample(sample)
    assert gen.shape == (T, 32, 48, 3)
    assert np.all(np.isfinite(gen))
    assert os.path.getsize(os.path.join(cfg.save_dir, "gen.mp4")) > 0


@pytest.mark.slow
def test_infer_smooth_end_to_end_with_eval(tmp_path):
    """Smooth variant: SLERP-interpolated per-frame target cameras + the
    held-out target-view eval JSON (the reference's
    run_w_cam_poses_mvtracker_smooth.py:469-689 path)."""
    import json

    from scipy.spatial.transform import Rotation

    from trajectorycrafter_tpu.known_poses import (
        CameraPoseTrajCrafter,
        load_mvtracker_npz,
    )

    rng = np.random.default_rng(5)
    V, T, H, W = 2, 9, 48, 80
    extrs = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]), (V, T, 1, 1))
    extrs[1, :, :3, :3] = Rotation.from_euler("y", 0.15).as_matrix()
    extrs[1, :, 0, 3] = 0.3
    path = tmp_path / "kubric.npz"
    np.savez(
        path,
        video=rng.uniform(0, 255, (V, T, 3, H, W)).astype(np.uint8),
        videodepth=rng.uniform(2, 5, (V, T, 1, H, W)).astype(np.float32),
        intrs=np.tile(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]),
                      (V, T, 1, 1)),
        extrs=extrs,
    )
    sample = load_mvtracker_npz(str(path))

    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    cfg.video_length = T
    cfg.warp_size = (H, W)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.num_inference_steps = 2
    cfg.diffusion.prompt = "a scene"
    cfg.save_dir = str(tmp_path / "out")
    os.makedirs(cfg.save_dir, exist_ok=True)

    tc = CameraPoseTrajCrafter(cfg)
    gen, metrics = tc.infer_camera_poses_smooth(
        sample["frames"], sample["depths"],
        sample["source_cam"], sample["target_cam"],
        target_frames=sample["target_frames"],
    )
    assert gen.shape == (T, 32, 48, 3)
    assert metrics is not None
    for k in ("PSNR", "SSIM", "MS_SSIM"):
        assert np.isfinite(metrics["metrics"][k])
    with open(os.path.join(cfg.save_dir, "metrics.json")) as f:
        on_disk = json.load(f)
    assert on_disk["metrics"] == metrics["metrics"]
    for artifact in ("metrics_summary.txt", "last_frame_comparison_smooth.png",
                     "target_gt_smooth.mp4",
                     "comparison_gen_vs_target_smooth.mp4"):
        assert os.path.getsize(os.path.join(cfg.save_dir, artifact)) > 0


@pytest.mark.slow
def test_run_w_cam_poses_smooth_cli(tmp_path, monkeypatch):
    """Root entry `run_w_cam_poses.py --smooth --target_video ...` end-to-end
    with dev stubs: parses calib json, undistorts, interpolates, evaluates."""
    import json

    from trajectorycrafter_tpu.utils.video import save_video

    import run_w_cam_poses as rwcp

    rng = np.random.default_rng(13)
    T, H, W = 9, 48, 80
    src_path = str(tmp_path / "src.mp4")
    tgt_path = str(tmp_path / "tgt.mp4")
    save_video(rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32), src_path)
    save_video(rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32), tgt_path)
    calib = {"cameras": [
        {"name": "a", "K": [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
         "R": np.eye(3).tolist(), "t": [[0.0], [0.0], [0.0]]},
        {"name": "b", "K": [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
         "R": np.eye(3).tolist(), "t": [[30.0], [0.0], [5.0]]},  # cm
    ]}
    calib_path = str(tmp_path / "calib.json")
    with open(calib_path, "w") as f:
        json.dump(calib, f)
    depth_path = str(tmp_path / "depth.npy")
    np.save(depth_path, np.full((T, H, W), 3.0, np.float32))

    orig = rwcp.config_from_args

    def patched(args):
        cfg = orig(args)
        cfg.warp_size = (H, W)
        return cfg

    monkeypatch.setattr(rwcp, "config_from_args", patched)
    out_dir = str(tmp_path / "out")
    rwcp.main([
        "--video_path", src_path, "--video_length", str(T),
        "--sample_size", "32", "48", "--diffusion_inference_steps", "2",
        "--prompt", "a scene", "--allow_dev_stubs",
        "--out_dir", out_dir, "--exp_name", "t",
        "--calib_json", calib_path, "--source_cam", "a", "--target_cam", "b",
        "--depth_npy", depth_path, "--smooth", "--target_video", tgt_path,
    ])
    found = []
    for root, _, files in os.walk(out_dir):
        found += files
    assert "metrics.json" in found and "gen.mp4" in found


def test_smooth_warp_uses_interpolated_cameras(tmp_path):
    """The per-frame target extrinsics/intrinsics must actually move: frame 0
    warps to the (fixed) source view, the last frame to the target view."""
    import jax.numpy as jnp

    from trajectorycrafter_tpu.geometry.interpolate import (
        interpolate_intrinsics,
        interpolate_poses,
    )
    from trajectorycrafter_tpu.known_poses import CalibratedCamera
    from trajectorycrafter_tpu.ops.splat import forward_warp_batch

    rng = np.random.default_rng(9)
    n, H, W = 5, 24, 32
    frames = rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32)
    depths = np.full((n, H, W), 3.0, np.float32)
    src = CalibratedCamera(K=np.array([[40.0, 0, W / 2], [0, 40.0, H / 2],
                                       [0, 0, 1]]),
                           R=np.eye(3), t=np.zeros(3))
    tgt = CalibratedCamera(K=src.K * np.array([[1.5, 1, 1.2],
                                               [0, 1.5, 1.2], [0, 0, 1]]),
                           R=np.eye(3), t=np.array([0.5, 0.0, 0.0]))

    t2 = interpolate_poses(src.w2c, tgt.w2c, n)
    k2 = interpolate_intrinsics(src.K, tgt.K, n)
    t1 = jnp.tile(jnp.asarray(src.w2c, jnp.float32)[None], (n, 1, 1))
    k1 = jnp.tile(jnp.asarray(src.K, jnp.float32)[None], (n, 1, 1))
    warped, masks, _, _ = forward_warp_batch(
        jnp.asarray(frames * 2 - 1), jnp.asarray(depths), t1, t2, k1, k2)
    warped, masks = np.asarray(warped), np.asarray(masks)

    # frame 0: identity warp (target == source camera) -> full coverage,
    # pixels essentially unchanged
    assert masks[0].mean() > 0.99
    np.testing.assert_allclose((warped[0] + 1) / 2, frames[0], atol=2e-2)
    # last frame: translated camera -> part of the view disoccludes
    assert masks[-1].mean() < masks[0].mean() - 0.05
    # and the warps differ monotonically along the path
    diffs = [float(np.abs(warped[i] - warped[0]).mean()) for i in range(n)]
    assert diffs[-1] > diffs[1] > 0.0
