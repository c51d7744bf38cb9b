"""End-to-end orchestrator tests at micro scale (dev models, CPU).

These cover the full product path the CLI drives: video read -> depth ->
poses -> warp -> diffusion -> mp4 outputs, for each camera mode.
"""

import os

import numpy as np
import pytest

from trajectorycrafter_tpu.config import TrajCrafterConfig
from trajectorycrafter_tpu.utils.video import save_video

FIXTURE = "/root/reference/test/videos/p7.mp4"


def _micro_cfg(tmp_path, mode="gradual", camera="target"):
    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True  # no checkpoints in CI; dev stack is opt-in
    cfg.video_path = FIXTURE if os.path.exists(FIXTURE) else None
    cfg.video_length = 9  # must give odd latent count ((n-1)/4+1) for exact decode
    cfg.warp_size = (48, 80)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.num_inference_steps = 2
    cfg.diffusion.prompt = "a scene"
    cfg.render.mode = mode
    cfg.render.camera = camera
    cfg.render.target_pose = (10.0, -5.0, 0.1, 0.0, 0.0)
    cfg.save_dir = str(tmp_path / mode)
    return cfg


@pytest.fixture(scope="module")
def input_video(tmp_path_factory):
    """Synthesized input when the reference fixture isn't present."""
    if os.path.exists(FIXTURE):
        return FIXTURE
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    rng = np.random.default_rng(0)
    save_video(rng.uniform(0, 1, (6, 48, 80, 3)).astype(np.float32), path, fps=5)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["gradual", "bullet"])
def test_orchestrator_mode_end_to_end(tmp_path, input_video, mode):
    from trajectorycrafter_tpu.orchestrator import TrajCrafter

    cfg = _micro_cfg(tmp_path, mode=mode)
    cfg.video_path = input_video
    tc = TrajCrafter(cfg)
    gen = getattr(tc, f"infer_{mode}")()
    assert gen.shape == (9, 32, 48, 3)
    assert np.all(np.isfinite(gen))
    for name in ("input.mp4", "render.mp4", "mask.mp4", "gen.mp4", "viz.mp4"):
        assert os.path.getsize(os.path.join(cfg.save_dir, name)) > 0


@pytest.mark.slow
def test_autoregressive_v1_end_to_end(tmp_path, input_video):
    from trajectorycrafter_tpu.autoregressive import TrajCrafterAutoregressive

    cfg = _micro_cfg(tmp_path, mode="gradual")
    cfg.video_path = input_video
    tc = TrajCrafterAutoregressive(cfg)
    out = tc.infer_autoregressive(n_splits=2, overlap_frames=2, theta=30.0)
    assert out.shape[0] == 2 * 9 - 2  # segments minus overlap
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_direct_mode_end_to_end(tmp_path, input_video):
    """Direct mode: freeze-then-follow with the save_skip scheme
    (reference demo.py:169-303, cut frames dropped from gen/render/mask)."""
    from trajectorycrafter_tpu.orchestrator import TrajCrafter

    cfg = _micro_cfg(tmp_path, mode="direct")
    cfg.video_path = input_video
    tc = TrajCrafter(cfg)
    gen = tc.infer_direct(cut=3)
    # infer_direct returns the full generated clip; saved artefacts drop cut
    assert gen.shape == (9, 32, 48, 3)
    assert np.all(np.isfinite(gen))
    for name in ("input.mp4", "render.mp4", "mask.mp4", "gen.mp4", "viz.mp4"):
        assert os.path.getsize(os.path.join(cfg.save_dir, name)) > 0


@pytest.mark.slow
def test_zoom_mode_end_to_end(tmp_path, input_video):
    """Dolly-zoom: per-frame focal ramp K2 (reference demo.py:418-524)."""
    from trajectorycrafter_tpu.orchestrator import TrajCrafter

    cfg = _micro_cfg(tmp_path, mode="zoom")
    cfg.video_path = input_video
    tc = TrajCrafter(cfg)
    gen = tc.infer_zoom(f_new=300.0)
    assert gen.shape == (9, 32, 48, 3)
    assert np.all(np.isfinite(gen))


@pytest.mark.slow
def test_autoregressive_v2_global_cloud_end_to_end(tmp_path, input_video):
    """v2: global point-cloud autoregression (reference
    autoregressive_global.py:42-344): render from cloud, diffuse, re-lift
    with IQR scale alignment, merge."""
    from trajectorycrafter_tpu.autoregressive import TrajCrafterGlobalPointCloud

    cfg = _micro_cfg(tmp_path, mode="gradual")
    cfg.video_path = input_video
    tc = TrajCrafterGlobalPointCloud(cfg)
    out = tc.infer_autoregressive(n_splits=2, overlap_frames=2, theta=30.0,
                                  max_points=200_000)
    assert out.shape[0] == 2 * 9 - 2
    assert np.all(np.isfinite(out))
