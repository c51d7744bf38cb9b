"""Gradio app tests (gradio itself is not installed in this image, so only
the import-safe surface is covered: preset strings and the run wiring)."""

import pytest
import numpy as np


def test_module_imports_without_gradio():
    import gradio_app  # gradio is imported lazily inside build_app

    assert callable(gradio_app.build_app)


def test_presets_match_reference_show_traj():
    """Pose strings pinned to reference gradio_app.py:44-76."""
    from gradio_app import TRAJ_PRESETS

    assert TRAJ_PRESETS["Orbit Left"] == "0; -30; 0; 0; 0"
    assert TRAJ_PRESETS["Orbit Up"] == "30; 0; 0; 0; 0"
    assert TRAJ_PRESETS["Orbit Down"] == "-20; 0; 0; 0; 0"
    assert TRAJ_PRESETS["Pan Left"] == "0; 0; 0; -2; 0"
    assert TRAJ_PRESETS["Pan Up"] == "0; 0; 0; 0; 2"
    assert TRAJ_PRESETS["Zoom in"] == "0; 0; 0.5; 0; 0"
    assert TRAJ_PRESETS["Zoom out"] == "0; 0; -0.5; 0; 0"
    assert len(TRAJ_PRESETS) == 10


@pytest.mark.slow
def test_run_pipeline_runs_dev_pipeline(tmp_path):
    """run_pipeline drives infer_gradual into a per-run subdir."""
    import os

    from gradio_app import run_pipeline
    from trajectorycrafter_tpu.config import TrajCrafterConfig
    from trajectorycrafter_tpu.orchestrator import TrajCrafter
    from trajectorycrafter_tpu.utils.video import save_video

    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    cfg.video_length = 9
    cfg.warp_size = (48, 80)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.prompt = "a scene"
    cfg.save_dir = str(tmp_path / "gradio")
    os.makedirs(cfg.save_dir, exist_ok=True)

    vid = str(tmp_path / "in.mp4")
    rng = np.random.default_rng(0)
    save_video(rng.uniform(0, 1, (9, 48, 80, 3)).astype(np.float32), vid, fps=5)

    tc = TrajCrafter(cfg)
    out = run_pipeline(vid, 1, 1.0, "0; 30; 0; 0; 0", 2, 43, cfg, tc)
    assert os.path.getsize(out) > 0
    assert out.startswith(cfg.save_dir)
