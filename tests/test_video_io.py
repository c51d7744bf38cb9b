"""Video I/O + native hostops tests."""

import os

import numpy as np
import pytest

from trajectorycrafter_tpu.utils.video import (
    f01_to_u8,
    pad_to_length,
    read_video_frames,
    save_video,
    u8_to_f01,
)


def test_u8_f01_roundtrip(rng):
    u8 = rng.integers(0, 256, (3, 8, 9, 3), dtype=np.uint8)
    f = u8_to_f01(u8)
    assert f.dtype == np.float32 and f.max() <= 1.0
    np.testing.assert_allclose(f, u8.astype(np.float32) / 255.0, atol=1e-7)
    back = f01_to_u8(f)
    np.testing.assert_array_equal(back, u8)


def test_native_hostops_present_and_matches_numpy(rng):
    hostops = pytest.importorskip("trajectorycrafter_tpu.hostops")
    u8 = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        hostops.u8_to_f01(u8), u8.astype(np.float32) / 255.0, atol=1e-7
    )
    import cv2

    big = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    got = hostops.resize_bilinear_u8(big, 16, 24)
    want = cv2.resize(big, (24, 16), interpolation=cv2.INTER_LINEAR)
    # half-pixel bilinear identical up to rounding
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_write_read_roundtrip(tmp_path, rng):
    frames = rng.uniform(0, 1, (6, 32, 48, 3)).astype(np.float32)
    path = str(tmp_path / "t.mp4")
    save_video(frames, path, fps=5)
    assert os.path.getsize(path) > 0
    back = read_video_frames(path, -1, width=48, height=32)
    assert back.shape == (6, 32, 48, 3)


def test_pad_to_length(rng):
    frames = rng.uniform(0, 1, (3, 4, 4, 3)).astype(np.float32)
    out = pad_to_length(frames, 7)
    assert out.shape[0] == 7
    np.testing.assert_allclose(out[3:], np.repeat(frames[-1:], 4, 0))
    assert pad_to_length(frames, 2).shape[0] == 2


def test_video_save_queue_overlaps_and_propagates(tmp_path):
    from trajectorycrafter_tpu.utils.video import VideoSaveQueue, read_video_frames

    frames = np.random.rand(5, 32, 48, 3).astype(np.float32)
    q = VideoSaveQueue()
    q.save(frames, str(tmp_path / "a.mp4"), fps=5)
    q.save(frames, str(tmp_path / "b.mp4"), fps=5)
    q.join()
    for name in ("a.mp4", "b.mp4"):
        got = read_video_frames(str(tmp_path / name), 5, 1, width=48, height=32)
        assert got.shape == (5, 32, 48, 3)

    # failures surface at join, not silently
    q2 = VideoSaveQueue()
    q2.save(np.zeros((0, 8, 8, 3)), str(tmp_path / "bad.mp4"))
    with pytest.raises(RuntimeError, match="bad.mp4"):
        q2.join()
