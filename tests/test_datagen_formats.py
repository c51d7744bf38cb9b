"""Dataset-format loaders for training-data generation (datagen.py).

Fixture-backed: synthesizes a SceneFlow/Monkaa-layout tree (png frames, pfm
disparities, camera_data.txt) and a TartanAir-layout tree (png + depth npy +
pose_left.txt + list file) and checks they flow through
load_*_clip -> clips_from_dataset -> generate_dataset into .npz samples that
training/data.LatentsDataset loads (VERDICT round-1 item 10).
"""

import os

import numpy as np
import pytest

from trajectorycrafter_tpu.datagen import (
    clips_from_dataset,
    disparity_to_depth,
    is_low_motion,
    load_sceneflow_clip,
    load_tartanair_clip,
    motion_metrics,
    parse_ta_datafile,
    read_pfm,
    read_sceneflow_camera_data,
    sceneflow_intrinsics,
    tartanair_pose_to_w2c,
)


def _write_pfm(path, arr, little_endian=True):
    """Minimal PFM writer (rows bottom-to-top per the spec)."""
    arr = np.asarray(arr, np.float32)
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{arr.shape[1]} {arr.shape[0]}\n".encode())
        f.write(b"-1.0\n" if little_endian else b"1.0\n")
        data = np.flipud(arr).astype("<f4" if little_endian else ">f4")
        f.write(data.tobytes())


def test_read_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.uniform(1, 50, (6, 9)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    _write_pfm(p, arr)
    np.testing.assert_allclose(read_pfm(p), arr)
    _write_pfm(p, arr, little_endian=False)
    np.testing.assert_allclose(read_pfm(p), arr)


def test_disparity_to_depth():
    d = disparity_to_depth(np.array([10.5, 21.0]), focal=1050.0, baseline=1.0)
    np.testing.assert_allclose(d, [100.0, 50.0])


def _write_sceneflow_tree(root, scene="funnyworld_x2", n=4, size=(8, 12)):
    import cv2

    h, w = size
    rng = np.random.default_rng(1)
    os.makedirs(os.path.join(root, "frames_cleanpass", scene, "left"))
    os.makedirs(os.path.join(root, "disparity", scene, "left"))
    os.makedirs(os.path.join(root, "camera_data", scene))
    lines = []
    for i in range(n):
        cv2.imwrite(os.path.join(root, "frames_cleanpass", scene, "left",
                                 f"{i:04d}.png"),
                    rng.uniform(0, 255, (h, w, 3)).astype(np.uint8))
        _write_pfm(os.path.join(root, "disparity", scene, "left",
                                f"{i:04d}.pfm"),
                   rng.uniform(5, 20, (h, w)).astype(np.float32))
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i  # camera slides along x
        lines.append(f"Frame {i}")
        lines.append("L " + " ".join(str(v) for v in c2w.reshape(-1)))
        lines.append("R " + " ".join(str(v) for v in c2w.reshape(-1)))
    with open(os.path.join(root, "camera_data", scene, "camera_data.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    return scene


def test_sceneflow_camera_parse_and_clip(tmp_path):
    scene = _write_sceneflow_tree(str(tmp_path))
    cam = read_sceneflow_camera_data(
        os.path.join(tmp_path, "camera_data", scene, "camera_data.txt"))
    assert sorted(cam) == [0, 1, 2, 3]
    assert cam[2]["L"][0, 3] == pytest.approx(0.2)

    clip = load_sceneflow_clip(str(tmp_path), scene, focal=10.0)
    assert clip["frames"].shape == (4, 8, 12, 3)
    assert clip["frames"].max() <= 1.0
    assert clip["depths"].shape == (4, 8, 12)
    # w2c = inv(c2w): translation negated for the identity-rotation fixture
    np.testing.assert_allclose(clip["poses"][2][0, 3], -0.2, atol=1e-12)
    np.testing.assert_allclose(clip["K"], sceneflow_intrinsics(10.0, 12, 8))


def test_motion_filter_semantics():
    # static camera: fails the non-zero-motion criterion
    static = np.tile(np.eye(4)[None], (5, 1, 1))
    ok, m = is_low_motion(static)
    assert not ok and m["total_translation"] == 0.0
    # gentle pan: passes
    gentle = static.copy()
    gentle[:, 0, 3] = np.linspace(0, 20, 5)
    ok, m = is_low_motion(gentle)
    assert ok and m["total_translation"] == pytest.approx(20.0)
    # wild motion: fails the max cap
    wild = static.copy()
    wild[:, 0, 3] = np.linspace(0, 500, 5)
    assert not is_low_motion(wild)[0]


def test_parse_ta_datafile(tmp_path):
    p = tmp_path / "ta.txt"
    p.write_text("seqA/Easy/P000 3\n000000\n000001\n000005\n"
                 "seqB/Hard/P001 2\n000010\n000011\n")
    entries = parse_ta_datafile(str(p))
    assert entries == [("seqA/Easy/P000", [0, 1, 5]),
                       ("seqB/Hard/P001", [10, 11])]
    # reference file parses too
    if os.path.exists("/root/reference/ta_datafile.txt"):
        ref = parse_ta_datafile("/root/reference/ta_datafile.txt")
        assert ref[0][0] == "AbandonedFactory/Data_easy/P000"
        assert len(ref[0][1]) == 200


def test_tartanair_pose_conversion():
    # identity NED pose -> identity w2c
    np.testing.assert_allclose(
        tartanair_pose_to_w2c([0, 0, 0, 0, 0, 0, 1]), np.eye(4), atol=1e-12)
    # NED x (forward) translation becomes camera z (forward)
    w2c = tartanair_pose_to_w2c([2.0, 0, 0, 0, 0, 0, 1])
    c2w = np.linalg.inv(w2c)
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 2.0], atol=1e-12)
    # NED z (down) becomes camera y (down)
    w2c = tartanair_pose_to_w2c([0, 0, 3.0, 0, 0, 0, 1])
    np.testing.assert_allclose(np.linalg.inv(w2c)[:3, 3], [0, 3.0, 0],
                               atol=1e-12)


def _write_tartanair_tree(root, seq="toy/Easy/P000", n=3, size=(8, 12)):
    import cv2

    h, w = size
    rng = np.random.default_rng(2)
    seq_dir = os.path.join(root, seq)
    os.makedirs(os.path.join(seq_dir, "image_left"))
    os.makedirs(os.path.join(seq_dir, "depth_left"))
    poses = []
    for i in range(n):
        cv2.imwrite(os.path.join(seq_dir, "image_left", f"{i:06d}_left.png"),
                    rng.uniform(0, 255, (h, w, 3)).astype(np.uint8))
        np.save(os.path.join(seq_dir, "depth_left", f"{i:06d}_left_depth.npy"),
                rng.uniform(2, 6, (h, w)).astype(np.float32))
        poses.append([0.5 * i, 0, 0, 0, 0, 0, 1])  # slide forward in NED x
    np.savetxt(os.path.join(seq_dir, "pose_left.txt"), np.asarray(poses))
    return seq


def test_tartanair_clip_loader(tmp_path):
    seq = _write_tartanair_tree(str(tmp_path))
    clip = load_tartanair_clip(str(tmp_path), seq, [0, 1, 2])
    assert clip["frames"].shape == (3, 8, 12, 3)
    assert clip["depths"].shape == (3, 8, 12)
    assert clip["K"][0, 0] == 320.0
    # forward NED motion -> camera z translation in c2w
    c2w = np.linalg.inv(clip["poses"][2])
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 1.0], atol=1e-12)


@pytest.mark.slow
def test_sceneflow_tree_to_training_samples(tmp_path):
    """Full path: synthetic SceneFlow tree -> clips -> generate_dataset ->
    LatentsDataset-loadable npz (VERDICT item 10 done-criterion)."""
    import jax
    import jax.numpy as jnp

    from trajectorycrafter_tpu.datagen import generate_dataset
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.training.data import LatentsDataset

    scene = _write_sceneflow_tree(str(tmp_path / "sf"), n=5, size=(16, 24))
    clip = load_sceneflow_clip(str(tmp_path / "sf"), scene, focal=20.0)
    # depths from random disparities are huge; rescale into warp-friendly range
    clip["depths"] = np.clip(clip["depths"], 0, 10.0)

    vae = AutoencoderKLCogVideoX(latent_channels=4,
                                 block_out_channels=(8, 16, 16, 32),
                                 layers_per_block=1, norm_num_groups=4)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 48, 3)))["params"]
    pe = np.zeros((7, 32), np.float32)

    out = generate_dataset(
        vae, vae_params, str(tmp_path / "out"),
        clips_from_dataset(iter([clip]), anchor=2, motion_filter=False),
        pe, sample_size=(32, 48),
    )
    ds = LatentsDataset(out)
    item = ds[0]
    assert item["gt_latents"].shape == (2, 4, 6, 4)
    assert item["inpaint_latents"].shape == (2, 4, 6, 5)
    assert np.all(np.isfinite(item["gt_latents"]))
