"""PSNR/SSIM quality metrics (`utils/quality.py`) — the acceptance check the
int8 path waits on ("PSNR-matched outputs at fixed seeds", BASELINE.md)."""

import json

import numpy as np
import pytest

from trajectorycrafter_tpu.utils.quality import psnr, video_quality


def test_psnr_known_values():
    a = np.zeros((4, 4), np.float64)
    assert psnr(a, a) == float("inf")
    # uniform error e: PSNR = 20 log10(255/|e|)
    b = a + 2.0
    np.testing.assert_allclose(psnr(a, b), 20 * np.log10(255.0 / 2.0))
    with pytest.raises(ValueError, match="shape mismatch"):
        psnr(a, np.zeros((4, 5)))


def test_video_quality_identical_and_noise():
    rng = np.random.default_rng(0)
    vid = rng.integers(0, 256, (3, 16, 24, 3)).astype(np.uint8)
    m = video_quality(vid, vid)
    assert m["psnr_db"] == float("inf")
    assert m["ssim"] == pytest.approx(1.0)
    assert m["frames"] == 3

    noisy = np.clip(vid.astype(np.int32)
                    + rng.integers(-3, 4, vid.shape), 0, 255).astype(np.uint8)
    m = video_quality(vid, noisy)
    # +/-3 uniform 8-bit noise sits around 38-42 dB; SSIM stays high
    assert 35.0 < m["psnr_db"] < 50.0
    assert m["psnr_min_frame_db"] <= m["psnr_db"]
    assert 0.9 < m["ssim"] <= 1.0
    assert m["ssim_min_frame"] <= m["ssim"]

    # heavy degradation must rank clearly below light noise
    wrecked = np.clip(vid.astype(np.int32)
                      + rng.integers(-80, 81, vid.shape), 0, 255).astype(np.uint8)
    w = video_quality(vid, wrecked)
    assert w["psnr_db"] < m["psnr_db"] - 10
    assert w["ssim"] < m["ssim"]


def test_quality_cli_roundtrip(tmp_path, capsys):
    from trajectorycrafter_tpu.utils.quality import main
    from trajectorycrafter_tpu.utils.video import save_video

    rng = np.random.default_rng(1)
    vid = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    a, b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    save_video(vid, a)
    save_video(vid + rng.uniform(-0.005, 0.005, vid.shape).astype(np.float32), b)
    main([a, b, "--psnr_pass_db", "30"])
    m = json.loads(capsys.readouterr().out)
    assert m["pass"] and m["psnr_db"] > 30.0

    # below-threshold comparison exits non-zero
    c = str(tmp_path / "c.mp4")
    save_video(rng.uniform(0, 1, vid.shape).astype(np.float32), c)
    with pytest.raises(SystemExit):
        main([a, c, "--psnr_pass_db", "30"])


def test_quality_cli_strict_json_and_frame_mismatch(tmp_path, capsys):
    """Identical videos emit finite PSNR (strict-JSON safe); a truncated run
    fails unless --allow-frame-mismatch is passed (ADVICE r3 items 1-2)."""
    from trajectorycrafter_tpu.utils.quality import main
    from trajectorycrafter_tpu.utils.video import save_video

    rng = np.random.default_rng(2)
    vid = rng.uniform(0.3, 0.7, (4, 64, 64, 3)).astype(np.float32)
    a, b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    save_video(vid, a)
    save_video(vid, b)
    main([a, b])
    m = json.loads(capsys.readouterr().out)  # strict: no 'Infinity' token
    assert m["pass"] and np.isfinite(m["psnr_db"]) and np.isfinite(
        m["psnr_min_frame_db"])

    # a partial run (fewer frames) must not pass silently
    short = str(tmp_path / "short.mp4")
    save_video(vid[:2], short)
    with pytest.raises(SystemExit):
        main([a, short])
    m = json.loads(capsys.readouterr().out)
    assert m["pass"] is False and m["frames_b"] == 2

    main([a, short, "--allow-frame-mismatch", "--psnr_pass_db", "30"])
    m = json.loads(capsys.readouterr().out)
    assert m["pass"] and m["frames"] == 2 and m["frames_a"] == 4
