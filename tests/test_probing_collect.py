"""Probing data-collection harness (probing.py: CameraMotionFilter,
collect_activation_dataset, ActivationDataset; reference
notebooks/15_10_25_depth/collect_dataset.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _poses(n, step_t=0.0, step_rot=0.0):
    """n c2w poses advancing by step_t along x and step_rot (radians) about y."""
    poses = []
    for i in range(n):
        a = step_rot * i
        c, s = np.cos(a), np.sin(a)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        m[:3, 3] = [step_t * i, 0, 0]
        poses.append(m)
    return np.stack(poses)


class TestCameraMotionFilter:
    def test_metrics_exact(self):
        from trajectorycrafter_tpu.probing import CameraMotionFilter

        f = CameraMotionFilter()
        m = f.compute_motion_metrics(_poses(5, step_t=2.0, step_rot=0.05))
        np.testing.assert_allclose(m["total_translation"], 8.0, rtol=1e-5)
        np.testing.assert_allclose(m["max_frame_translation"], 2.0, rtol=1e-5)
        np.testing.assert_allclose(m["total_rotation"], 0.2, rtol=1e-4)
        np.testing.assert_allclose(m["mean_frame_rotation"], 0.05, rtol=1e-4)

    def test_gating(self):
        from trajectorycrafter_tpu.probing import CameraMotionFilter

        f = CameraMotionFilter(min_total_translation=1.0,
                               max_total_translation=10.0,
                               min_total_rotation=0.01,
                               max_total_rotation=0.5)
        ok, _ = f.is_low_motion(_poses(5, step_t=1.0))  # total 4 in range
        assert ok
        ok, _ = f.is_low_motion(_poses(5, step_t=5.0))  # total 20 > max
        assert not ok
        ok, _ = f.is_low_motion(_poses(5, step_rot=0.3))  # rotation 1.2 > max
        assert not ok
        ok, _ = f.is_low_motion(_poses(5))  # static: below both minima
        assert not ok


@pytest.fixture(scope="module")
def tiny_setup():
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.schedulers import CogVideoXDDIMScheduler

    f, h, w, c = 2, 4, 4, 4
    model = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=2 * c + 1,
        out_channels=c, time_embed_dim=16, text_embed_dim=8, num_layers=3,
        max_text_seq_length=3, cross_attn_dim_head=8, cross_attn_num_heads=2,
        use_rotary_positional_embeddings=True, attention_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, h, w, c)), jnp.zeros((1, 3, 8)), jnp.zeros((1,)),
        jnp.zeros((1, f, h, w, c + 1)), jnp.zeros((1, 1, h, w, c)),
    )["params"]
    scheduler = CogVideoXDDIMScheduler()
    return model, params, scheduler, scheduler.set_timesteps(50), (f, h, w, c)


def _samples(rng, shapes, n=3):
    f, h, w, c = shapes
    out = []
    for i in range(n):
        # sample 2 gets high motion and must be filtered out
        step_t = 0.5 if i < 2 else 50.0
        out.append({
            "name": f"s{i}",
            "gt_latents": rng.standard_normal((f, h, w, c)).astype(np.float32),
            "prompt_embeds": rng.standard_normal((3, 8)).astype(np.float32),
            "ref_latents": rng.standard_normal((1, h, w, c)).astype(np.float32),
            "inpaint_latents": rng.standard_normal((f, h, w, c + 1)).astype(np.float32),
            "poses": _poses(5, step_t=step_t, step_rot=0.02),
            "depth": rng.uniform(1, 5, (f, h, w)).astype(np.float32),
        })
    return out


@pytest.mark.slow
def test_collect_and_load_activation_dataset(tiny_setup, rng, tmp_path):
    from trajectorycrafter_tpu.probing import (
        ActivationDataset,
        CameraMotionFilter,
        collect_activation_dataset,
    )

    model, params, scheduler, sch_state, shapes = tiny_setup
    f, h, w, c = shapes
    samples = _samples(rng, shapes)
    timesteps, blocks = [100, 800], [0, 2]
    manifest = collect_activation_dataset(
        model, params, scheduler, sch_state, samples, timesteps, blocks,
        str(tmp_path),
        motion_filter=CameraMotionFilter(min_total_translation=0.5,
                                         max_total_translation=10.0),
    )
    assert manifest["kept"] == ["s0", "s1"]
    assert [s["name"] for s in manifest["skipped"]] == ["s2"]
    # 2 kept samples x 2 timesteps x 2 blocks
    assert manifest["files"] == 8

    for t in timesteps:
        for b in blocks:
            ds = ActivationDataset(str(tmp_path), t, b)
            assert len(ds) == 2
            tokens, depths = ds.stacked()
            s_video = f * (h // 2) * (w // 2)
            assert tokens.shape == (2, s_video, 16)
            assert np.isfinite(tokens).all()
            assert depths.shape == (2, f, h, w)
    # different timesteps see different noised inputs -> different features
    a, _ = ActivationDataset(str(tmp_path), 100, 0).stacked()
    b_, _ = ActivationDataset(str(tmp_path), 800, 0).stacked()
    assert np.abs(a - b_).max() > 1e-3

    with pytest.raises(FileNotFoundError):
        ActivationDataset(str(tmp_path), 999, 0)

    # re-collecting into the same root with a different subset must not pick
    # up the first run's leftover sample dirs (manifest.json gates loading)
    collect_activation_dataset(
        model, params, scheduler, sch_state, samples[1:2], timesteps, blocks,
        str(tmp_path))
    for t in timesteps:
        ds = ActivationDataset(str(tmp_path), t, 0)
        assert len(ds) == 1  # only s1; stale s0 dir is ignored


@pytest.mark.slow
def test_probe_depth_collect_end_to_end(rng, tmp_path, capsys):
    """Full CLI: collect features/<t>/<block> then train probes from them."""
    import probe_depth

    from trajectorycrafter_tpu.training.data import save_latent_sample

    f, h, w, c = 2, 4, 4, 4
    data_dir = tmp_path / "latents"
    data_dir.mkdir()
    for i in range(2):
        save_latent_sample(
            str(data_dir / f"s{i}.npz"),
            gt_latents=rng.standard_normal((f, h, w, c)).astype(np.float32),
            ref_latents=rng.standard_normal((1, h, w, c)).astype(np.float32),
            inpaint_latents=rng.standard_normal((f, h, w, c + 1)).astype(np.float32),
            prompt_embeds=rng.standard_normal((3, 8)).astype(np.float32),
            depth=rng.uniform(1, 5, (f, h, w)).astype(np.float32),
            poses=_poses(5, step_t=0.5),
        )
    out_dir = tmp_path / "probes"
    collect_dir = tmp_path / "activations"
    probe_depth.main([
        "--data_dir", str(data_dir), "--output_dir", str(out_dir),
        "--collect_dir", str(collect_dir), "--timesteps", "100", "400",
        "--blocks", "0", "1", "--steps", "30",
    ])
    captured = capsys.readouterr().out
    assert "collected 8 feature files" in captured
    assert "relative depth error" in captured
    for t in (100, 400):
        for b in (0, 1):
            assert (collect_dir / "sample_0000" / "features" / f"timestep_{t}"
                    / f"transformer_block_{b}.npy").is_file()
            assert (out_dir / f"probe_t{t}_block{b}").is_dir()
