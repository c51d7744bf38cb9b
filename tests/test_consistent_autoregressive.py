"""Consistent-depth autoregressive loop tests (SURVEY 2.17 glue).

Micro-scale end-to-end runs of the alignment-driven driver
(reference notebooks/12_11_25_consistent_depth/autoregressive_alignment/)
plus unit tests of its geometry helpers.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.config import TrajCrafterConfig
from trajectorycrafter_tpu.consistent_autoregressive import (
    DEPTH_SCALE,
    TrajCrafterConsistentDepth,
    estimate_depth_with_prompt_alignment,
    invert_depth_with_scale,
    lift_video_to_pcs,
    merge_pcs_downsample,
    render_video_from_pcs,
)
from trajectorycrafter_tpu.utils.video import save_video


def test_invert_depth_preserves_zeros():
    d = jnp.asarray([[0.0, 2.0], [4.0, 0.0]])
    inv = invert_depth_with_scale(d, 100.0)
    np.testing.assert_allclose(np.asarray(inv), [[0.0, 50.0], [25.0, 0.0]])
    # involution: invert twice returns the original where valid
    back = invert_depth_with_scale(inv, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d))


def test_lift_render_roundtrip():
    """A cloud lifted from a frame renders back to (nearly) the same frame
    from the same camera."""
    h, w = 24, 32
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    depth = jnp.full((h, w), 2.0)
    K = jnp.asarray([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1.0]])
    pose = jnp.eye(4)
    pcs = lift_video_to_pcs(frame[None], depth[None], K, pose[None])
    imgs, depths, masks = render_video_from_pcs(pcs, pose[None], K, (h, w),
                                                point_size=1, mask_kernel=3)
    inner = (slice(2, -2), slice(2, -2))
    assert masks[0][inner].mean() > 0.95
    valid = masks[0][inner] > 0
    np.testing.assert_allclose(depths[0][inner][valid], 2.0, atol=1e-3)
    np.testing.assert_allclose(imgs[0][inner][valid],
                               np.asarray(frame)[inner][valid], atol=1e-5)


def test_merge_pcs_downsample_halves():
    key = jax.random.PRNGKey(0)
    g = [(jnp.zeros((100, 3)), jnp.zeros((100, 3)))]
    n = [(jnp.ones((60, 3)), jnp.ones((60, 3)))]
    merged = merge_pcs_downsample(g, n, key)
    assert merged[0][0].shape == (80, 3)  # (100+60)//2


@pytest.mark.slow
def test_estimate_depth_with_alignment_scale_shift_path(rng):
    """The trainer-backed alignment recovers a known scale on a tiny VDA."""
    from trajectorycrafter_tpu.depth_alignment import DepthAlignmentTrainer
    from trajectorycrafter_tpu.models.vda import VDAConfig, VideoDepthAnything

    cfg = VDAConfig(hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, patch_size=14, image_size=28,
                    out_indices=(1, 1, 2, 2), features=8,
                    out_channels=(8, 8, 8, 8), head_hidden_size=4,
                    num_temporal_blocks=0, temporal_heads=2)
    model = VideoDepthAnything(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 28, 28, 3)))["params"]
    params["head"]["head_conv3"]["bias"] = jnp.full_like(
        params["head"]["head_conv3"]["bias"], 0.5)
    trainer = DepthAlignmentTrainer(model, params, lr=1e-2)

    f, h, w = 2, 56, 56
    frames = rng.random((f, h, w, 3)).astype(np.float32)
    sparse = np.full((f, h, w), 3.0, np.float32)
    mask = np.zeros((f, h, w), np.float32)
    mask[:, ::3, ::3] = 1.0  # sparse samples
    K = np.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1.0]])
    ext = np.tile(np.eye(4)[None], (f, 1, 1))
    out = estimate_depth_with_prompt_alignment(
        frames, sparse, mask, K, ext, trainer, resize_factor=2, epochs=3)
    assert out.shape == (f, h, w)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_consistent_autoregressive_end_to_end(tmp_path):
    """Two-stage run with the dev model stack and the scale/shift alignment
    path (no VDA): stages chain, per-stage artefacts are written."""
    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    cfg.video_length = 9
    cfg.warp_size = (48, 80)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.num_inference_steps = 2
    cfg.diffusion.prompt = "a scene"
    cfg.render.target_pose = (20.0, 0.0, 0.0, 0.0, 0.0)
    cfg.save_dir = str(tmp_path / "cons")

    path = str(tmp_path / "in.mp4")
    rng = np.random.default_rng(0)
    save_video(rng.uniform(0, 1, (9, 48, 80, 3)).astype(np.float32), path, fps=5)
    cfg.video_path = path

    tc = TrajCrafterConsistentDepth(cfg, align_epochs=3)
    out = tc.infer_autoregressive(n_splits=2, theta=30.0)
    assert out.shape == (18, 32, 48, 3)
    assert np.isfinite(out).all()
    for stage in range(2):
        sd = os.path.join(cfg.save_dir, f"stage_{stage:02d}")
        assert os.path.getsize(os.path.join(sd, "gen.mp4")) > 0
        assert os.path.exists(os.path.join(sd, "c2ws_target.npy"))


@pytest.mark.slow
def test_segment_depth_via_vda(tmp_path, rng):
    """VDA-backed segment depth: reflect-pad to multiple-of-14, windowed
    32/10 inference, inverse->metric conversion."""
    from trajectorycrafter_tpu.models.vda import VDAConfig, VideoDepthAnything

    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    vcfg = VDAConfig(hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, patch_size=14, image_size=28,
                     out_indices=(1, 1, 2, 2), features=8,
                     out_channels=(8, 8, 8, 8), head_hidden_size=4,
                     num_temporal_blocks=0, temporal_heads=2)
    model = VideoDepthAnything(vcfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 28, 28, 3)))["params"]
    params["head"]["head_conv3"]["bias"] = jnp.full_like(
        params["head"]["head_conv3"]["bias"], 0.5)

    tc = TrajCrafterConsistentDepth(cfg, vda=(model, params))
    frames = rng.random((5, 30, 44, 3)).astype(np.float32)  # not mult of 14
    d = tc._segment_depth(frames)
    assert d.shape == (5, 30, 44)
    assert np.isfinite(d).all()
    assert (d >= 0).all()
