"""Tests for auxiliary subsystems: probing, datagen, profiling, export."""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.probing import (
    ConvProbe,
    MLPProbe,
    collect_features,
    make_probe_trainer,
    relative_depth_error,
)


def _tiny_dit():
    model = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=16, in_channels=9,
        out_channels=4, time_embed_dim=16, text_embed_dim=32, num_layers=4,
        max_text_seq_length=7, cross_attn_dim_head=8, cross_attn_num_heads=4,
        use_rotary_positional_embeddings=False, attention_impl="xla",
        sample_width=12, sample_height=8, sample_frames=9,
    )
    rng = np.random.default_rng(0)
    b, f, h, w = 1, 3, 8, 12
    args = (
        jnp.asarray(rng.standard_normal((b, f, h, w, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 7, 32)).astype(np.float32)),
        jnp.asarray([311.0]),
        jnp.asarray(rng.standard_normal((b, f, h, w, 5)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 2, h, w, 4)).astype(np.float32)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    return model, params, args


@pytest.mark.slow
def test_collect_features_blocks():
    model, params, args = _tiny_dit()
    feats = collect_features(model, params, [1, 3], *args)
    assert set(feats) == {"transformer_block_1", "transformer_block_3"}
    # video tokens: 3 frames x 4 x 6 patches, dim 32
    assert feats["transformer_block_1"].shape == (1, 3 * 4 * 6, 32)
    assert not np.allclose(np.asarray(feats["transformer_block_1"]),
                           np.asarray(feats["transformer_block_3"]))


@pytest.mark.slow
def test_probe_training_decreases_loss(rng):
    model, params, args = _tiny_dit()
    feats = collect_features(model, params, [3], *args)
    tokens = feats["transformer_block_3"]
    target = jnp.asarray(rng.uniform(1, 3, (1, 3, 4, 6)).astype(np.float32))
    probe = ConvProbe(frames=3, height=4, width=6, hidden=16)
    init_fn, step_fn = make_probe_trainer(probe, lr=1e-2)
    state = init_fn(jax.random.PRNGKey(0), tokens)
    losses = []
    for _ in range(50):
        state, loss = step_fn(state, tokens, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5

    mlp = MLPProbe(frames=3, height=4, width=6, hidden=16)
    init_fn, step_fn = make_probe_trainer(mlp, lr=1e-2)
    st = init_fn(jax.random.PRNGKey(1), tokens)
    st, l0 = step_fn(st, tokens, target)
    assert np.isfinite(float(l0))
    pred = mlp.apply({"params": st.params}, tokens)
    assert relative_depth_error(np.asarray(pred), np.asarray(target)) >= 0


@pytest.mark.slow
def test_datagen_roundtrip(tmp_path, rng):
    from trajectorycrafter_tpu.datagen import (
        encode_sample,
        generate_pair_from_depth,
        smart_resize,
    )
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.training.data import LatentsDataset, save_latent_sample

    vae = AutoencoderKLCogVideoX(latent_channels=4, block_out_channels=(8, 16, 16, 32),
                                 layers_per_block=1, norm_num_groups=4)
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 48, 3)))["params"]

    f, h, w = 5, 48, 64
    frames = rng.uniform(0, 1, (f, h, w, 3)).astype(np.float32)
    depths = np.full((f, h, w), 2.0, np.float32)
    K = np.tile(np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32), (f, 1, 1))
    ps = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    pt = ps.copy()
    pt[:, 0, 3] = 0.05
    warped, masks = generate_pair_from_depth(frames, depths, ps, pt, K)
    assert warped.shape == frames.shape and masks.mean() > 0.8

    gt_r = smart_resize(frames, (32, 48))
    warped_r = smart_resize(warped, (32, 48))
    masks_r = (np.ones((f, 32, 48), np.float32))
    pe = rng.standard_normal((7, 32)).astype(np.float32)
    sample = encode_sample(vae, vae_params, gt_r, warped_r, masks_r, pe)
    assert sample["gt_latents"].shape == (2, 4, 6, 4)  # (5-1)/4+1=2 latent frames
    assert sample["inpaint_latents"].shape == (2, 4, 6, 5)

    save_latent_sample(str(tmp_path / "s0.npz"), **sample)
    ds = LatentsDataset(str(tmp_path))
    item = ds[0]
    np.testing.assert_allclose(item["gt_latents"], sample["gt_latents"])


def test_stage_timer_and_export(tmp_path, rng):
    from trajectorycrafter_tpu.utils.export import save_colmap, save_ply
    from trajectorycrafter_tpu.utils.profiling import StageTimer, device_memory_stats

    t = StageTimer()
    with t.stage("noop"):
        x = jnp.ones((8, 8)) * 2
    assert t.records[0]["seconds"] >= 0
    assert "noop" in t.summary()

    pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (10, 3)).astype(np.float32)
    save_ply(str(tmp_path / "pc.ply"), pts, cols)
    txt = open(tmp_path / "pc.ply").read()
    assert "element vertex 10" in txt

    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    c2w = np.eye(4)
    save_colmap(str(tmp_path / "colmap"), [K], [c2w], 64, 48, pts, cols)
    assert os.path.exists(tmp_path / "colmap" / "cameras.txt")
    images = open(tmp_path / "colmap" / "images.txt").read()
    assert "frame_00000.png" in images

    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_html_viewer_export(tmp_path, rng):
    """save_html_viewer writes a self-contained page: embedded point bytes
    round-trip through base64, camera list serialises, no external URLs."""
    import base64
    import json
    import re

    from trajectorycrafter_tpu.utils.export import save_html_viewer

    pts = rng.uniform(-1, 1, (17, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (17, 3)).astype(np.float32)
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    c2ws = [np.eye(4), np.diag([-1.0, 1.0, -1.0, 1.0])]
    out = tmp_path / "viewer.html"
    save_html_viewer(str(out), pts, cols, c2ws, [K, K], height=48)
    html = out.read_text()

    m = re.search(r'PTS = new Float32Array\(b64bytes\("([^"]+)"\)', html)
    decoded = np.frombuffer(base64.b64decode(m.group(1)), np.float32)
    np.testing.assert_allclose(decoded.reshape(-1, 3), pts)
    m = re.search(r"const CAMS = (\[.*?\]);", html, re.S)
    cams = json.loads(m.group(1))
    assert len(cams) == 2 and len(cams[0][0]) == 4  # [c2w 4x4, fov]
    assert abs(cams[0][1] - 2 * np.arctan(0.5 * 48 / 50.0)) < 1e-4
    assert "http://" not in html and "https://" not in html  # no CDN
    assert "17 points, 2 cameras" in html

    # subsampling path + no-camera path
    save_html_viewer(str(out), pts, cols, max_points=5)
    html = out.read_text()
    assert "5 points, 0 cameras" in html
