"""Quaternion SLERP camera-path interpolation (geometry/interpolate.py).

Golden-checked against a scalar numpy transcription of the reference
algorithm (run_w_cam_poses_mvtracker_smooth.py:176-366) so the vectorised
branchless JAX port provably computes the same path.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from trajectorycrafter_tpu.geometry.interpolate import (
    interpolate_intrinsics,
    interpolate_poses,
    mat_to_quat,
    quat_to_mat,
    slerp,
)


def _random_rotations(n, seed=0):
    return Rotation.random(n, random_state=seed).as_matrix()


def test_mat_quat_roundtrip():
    Rs = _random_rotations(64)
    q = np.asarray(mat_to_quat(Rs))
    back = np.asarray(quat_to_mat(q))
    np.testing.assert_allclose(back, Rs, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)


def test_mat_quat_covers_all_branches():
    # rotations that exercise each pivot branch of the 4-candidate extraction
    cases = [
        np.eye(3),                                    # trace-dominant (w)
        Rotation.from_euler("x", np.pi).as_matrix(),  # x-dominant
        Rotation.from_euler("y", np.pi).as_matrix(),  # y-dominant
        Rotation.from_euler("z", np.pi).as_matrix(),  # z-dominant
        Rotation.from_euler("xyz", [3.0, 0.1, 0.1]).as_matrix(),
    ]
    for Rm in cases:
        q = np.asarray(mat_to_quat(Rm))
        np.testing.assert_allclose(np.asarray(quat_to_mat(q)), Rm, atol=1e-6)


def test_slerp_matches_scipy():
    r = Rotation.random(2, random_state=3)
    q0 = np.asarray(mat_to_quat(r[0].as_matrix()))
    q1 = np.asarray(mat_to_quat(r[1].as_matrix()))
    alphas = np.linspace(0.0, 1.0, 11)
    ours = np.asarray(quat_to_mat(slerp(q0, q1, alphas)))
    ref = Slerp([0.0, 1.0], r)(alphas).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_slerp_shortest_path():
    # q and -q are the same rotation: slerp must not take the long way round
    r0 = Rotation.from_euler("z", 0.1)
    r1 = Rotation.from_euler("z", 0.3)
    q0 = np.asarray(mat_to_quat(r0.as_matrix()))
    q1 = -np.asarray(mat_to_quat(r1.as_matrix()))  # negated hemisphere
    mid = np.asarray(quat_to_mat(slerp(q0, q1, np.array([0.5]))))[0]
    np.testing.assert_allclose(
        mid, Rotation.from_euler("z", 0.2).as_matrix(), atol=1e-5)


def test_slerp_nearly_parallel_lerp_fallback():
    q0 = np.asarray(mat_to_quat(np.eye(3)))
    q1 = np.asarray(mat_to_quat(Rotation.from_euler("z", 1e-4).as_matrix()))
    out = np.asarray(slerp(q0, q1, np.linspace(0, 1, 5)))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)


# --- scalar transcription of the reference algorithm (golden oracle) --------


def _ref_slerp_quaternions(q1, q2, t):
    """run_w_cam_poses_mvtracker_smooth.py:343-366, numpy scalars."""
    dot = float(np.sum(q1 * q2))
    if dot < 0:
        q2, dot = -q2, -dot
    if dot > 0.9995:
        result = q1 + t * (q2 - q1)
        return result / np.linalg.norm(result)
    theta_0 = np.arccos(np.clip(abs(dot), 0, 1))
    sin_theta_0 = np.sin(theta_0)
    theta = theta_0 * t
    s0 = np.cos(theta) - dot * np.sin(theta) / sin_theta_0
    s1 = np.sin(theta) / sin_theta_0
    return s0 * q1 + s1 * q2


def _ref_interpolate_poses(src, tgt, num_steps):
    """run_w_cam_poses_mvtracker_smooth.py:176-224, per-step Python loop."""
    q1 = Rotation.from_matrix(src[:3, :3]).as_quat()  # xyzw
    q2 = Rotation.from_matrix(tgt[:3, :3]).as_quat()
    q1 = np.r_[q1[3], q1[:3]]  # -> wxyz
    q2 = np.r_[q2[3], q2[:3]]
    out = []
    for i in range(num_steps):
        a = i / (num_steps - 1) if num_steps > 1 else 0.0
        if a == 0.0:
            Rm = src[:3, :3]
        elif a == 1.0:
            Rm = tgt[:3, :3]
        else:
            q = _ref_slerp_quaternions(q1, q2, a)
            q = q / np.linalg.norm(q)
            Rm = Rotation.from_quat(np.r_[q[1:], q[0]]).as_matrix()
        P = np.eye(4)
        P[:3, :3] = Rm
        P[:3, 3] = (1 - a) * src[:3, 3] + a * tgt[:3, 3]
        out.append(P)
    return np.stack(out)


def test_interpolate_poses_matches_reference_transcription():
    rng = np.random.default_rng(7)
    src = np.eye(4)
    src[:3, :3] = Rotation.from_euler("xyz", [0.2, -0.4, 0.9]).as_matrix()
    src[:3, 3] = rng.normal(size=3)
    tgt = np.eye(4)
    tgt[:3, :3] = Rotation.from_euler("xyz", [-0.8, 0.3, -1.2]).as_matrix()
    tgt[:3, 3] = rng.normal(size=3)

    ours = np.asarray(interpolate_poses(src, tgt, 13))
    ref = _ref_interpolate_poses(src, tgt, 13)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # endpoints exact, intermediates proper rotations
    np.testing.assert_allclose(ours[0], src, atol=1e-6)
    np.testing.assert_allclose(ours[-1], tgt, atol=1e-6)
    dets = np.linalg.det(ours[:, :3, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def test_interpolate_poses_single_step():
    src, tgt = np.eye(4), np.eye(4)
    tgt[:3, 3] = [1, 2, 3]
    out = np.asarray(interpolate_poses(src, tgt, 1))
    assert out.shape == (1, 4, 4)
    np.testing.assert_allclose(out[0], src, atol=1e-6)  # alpha=0 at n=1


def test_interpolate_intrinsics_lerp():
    K0 = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    K1 = np.array([[200.0, 0, 64], [0, 150.0, 40], [0, 0, 1]])
    out = np.asarray(interpolate_intrinsics(K0, K1, 5))
    np.testing.assert_allclose(out[0], K0, atol=1e-6)
    np.testing.assert_allclose(out[-1], K1, atol=1e-6)
    np.testing.assert_allclose(out[2], (K0 + K1) / 2, atol=1e-5)


def test_ms_ssim_basics():
    from trajectorycrafter_tpu.utils.quality import ms_ssim

    rng = np.random.default_rng(11)
    a = rng.uniform(0, 255, (96, 128, 3))
    assert ms_ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    noisy = ms_ssim(a, b)
    assert 0.0 < noisy < 1.0
    c = rng.uniform(0, 255, a.shape)
    assert ms_ssim(a, c) < noisy  # unrelated image scores worse
    # small frames: levels that no longer fit are dropped, not fatal
    small = rng.uniform(0, 255, (20, 20))
    assert 0.0 <= ms_ssim(small, small) <= 1.0 + 1e-9


def test_gate_metrics_nan_maps_to_zero():
    from trajectorycrafter_tpu.utils.quality import gate_metrics

    m = gate_metrics({"psnr_db": float("nan"),
                      "psnr_min_frame_db": float("inf")}, 35.0)
    assert m["pass"] is False  # NaN >= bar is False
    assert m["psnr_db"] == 0.0  # NaN must not read as a passing 99.0
    assert m["psnr_min_frame_db"] == 99.0  # +inf (identical) still capped
