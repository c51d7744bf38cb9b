"""Tests for the consistent-depth alignment subsystem."""

import pytest
import numpy as np
import jax.numpy as jnp

from trajectorycrafter_tpu.depth_alignment import (
    align_window,
    estimate_depth_with_alignment,
    scale_shift_invariant_loss,
    temporal_alignment_error,
)


def test_align_window_recovers_scale_shift(rng):
    """If ref = a*depth + b, the optimiser must recover (a, b)."""
    f, h, w = 4, 12, 16
    depth = rng.uniform(1, 5, (f, h, w)).astype(np.float32)
    ref = 1.7 * depth + 0.4
    mask = np.ones((f, h, w), np.float32)
    aligned, loss = align_window(
        jnp.asarray(depth), jnp.asarray(ref), jnp.asarray(mask),
        steps=600, lr=0.1, tae_weight=0.0,
    )
    err = np.abs(np.asarray(aligned) - ref).mean()
    assert err < 0.05, err


def test_alignment_ignores_masked_regions(rng):
    f, h, w = 2, 10, 10
    depth = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    ref = 2.0 * depth.copy()
    ref[:, :, 5:] = 999.0  # corrupted but masked out
    mask = np.ones((f, h, w), np.float32)
    mask[:, :, 5:] = 0.0
    aligned, _ = align_window(jnp.asarray(depth), jnp.asarray(ref),
                              jnp.asarray(mask), steps=500, lr=0.1, tae_weight=0.0)
    err = np.abs(np.asarray(aligned[:, :, :5]) - ref[:, :, :5]).mean()
    assert err < 0.1


def test_windowed_alignment_full_video(rng):
    f, h, w = 20, 8, 8
    depth = rng.uniform(1, 4, (f, h, w)).astype(np.float32)
    ref = 1.5 * depth + 0.2
    mask = np.ones((f, h, w), np.float32)
    out = estimate_depth_with_alignment(depth, ref, mask, infer_len=8,
                                        overlap=3, steps=400)
    assert out.shape == depth.shape
    assert np.abs(out - ref).mean() < 0.1


def test_tae_zero_for_static_depth():
    d = jnp.ones((5, 4, 4)) * 3.0
    assert float(temporal_alignment_error(d)) == 0.0


def test_ssi_loss_invariant_to_scale_shift(rng):
    d = jnp.asarray(rng.uniform(1, 5, (2, 8, 8)).astype(np.float32))
    m = jnp.ones((2, 8, 8))
    base = float(scale_shift_invariant_loss(d, d, m))
    scaled = float(scale_shift_invariant_loss(1.0 / (2.0 / d + 0.1), d, m))
    assert base < 1e-5
    # disparity-space scale+shift of pred leaves the loss ~0
    assert scaled < 1e-4


# ---------------------------------------------------------------------------
# round-2 additions: closed-form scale/shift, geometric TAE, prompt trainer
# ---------------------------------------------------------------------------


def test_compute_scale_and_shift_exact(rng):
    from trajectorycrafter_tpu.depth_alignment import compute_scale_and_shift

    pred = rng.random((2, 6, 7), dtype=np.float32) + 0.5
    target = pred * 3.0 - 0.25
    mask = np.ones_like(pred)
    mask[:, :2] = 0.0  # exclude some pixels; relation still exact elsewhere
    s, t = compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(s), [3.0, 3.0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), [-0.25, -0.25], atol=1e-4)


def test_compute_scale_and_shift_degenerate():
    from trajectorycrafter_tpu.depth_alignment import compute_scale_and_shift

    pred = jnp.ones((1, 4, 4))
    s, t = compute_scale_and_shift(pred, pred * 2, jnp.zeros((1, 4, 4)))
    assert float(s[0]) == 1.0 and float(t[0]) == 0.0  # identity fallback


def test_geometric_tae_zero_for_consistent_depth():
    """A fronto-parallel plane seen by a camera translating along x keeps
    depth constant -> reprojection agreement -> TAE ~ 0."""
    from trajectorycrafter_tpu.depth_alignment import differentiable_tae

    f, h, w = 4, 16, 20
    depth = jnp.full((f, h, w), 2.0)
    K = jnp.asarray([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    ext = jnp.tile(jnp.eye(4)[None], (f, 1, 1))
    ext = ext.at[:, 0, 3].set(jnp.arange(f) * 0.01)  # small x translation
    tae = float(differentiable_tae(depth, K, ext))
    assert tae < 1e-4


def test_geometric_tae_flags_inconsistent_depth():
    from trajectorycrafter_tpu.depth_alignment import differentiable_tae

    f, h, w = 4, 16, 20
    K = jnp.asarray([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    ext = jnp.tile(jnp.eye(4)[None], (f, 1, 1))
    # static camera but depth jumps 2.0 -> 3.0 between frames: pure temporal
    # inconsistency the naive frame-diff TAE also sees, but here through the
    # reprojection path
    depth = jnp.stack([jnp.full((h, w), 2.0 + (i % 2)) for i in range(f)])
    tae = float(differentiable_tae(depth, K, ext))
    assert tae > 0.1


def test_evaluate_tae_symmetric():
    from trajectorycrafter_tpu.depth_alignment import evaluate_tae

    f, h, w = 3, 8, 8
    K = jnp.asarray([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    ext = jnp.tile(jnp.eye(4)[None], (f, 1, 1))
    depth = jnp.full((f, h, w), 1.5)
    assert evaluate_tae(depth, K, ext) < 1e-5


def _tiny_vda():
    import jax
    from trajectorycrafter_tpu.models.vda import VDAConfig, VideoDepthAnything

    cfg = VDAConfig(hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, patch_size=14, image_size=28,
                    out_indices=(1, 1, 2, 2), features=8,
                    out_channels=(8, 8, 8, 8), head_hidden_size=4,
                    num_temporal_blocks=1, temporal_heads=2)
    model = VideoDepthAnything(cfg)
    frames = jnp.zeros((1, 2, 28, 28, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames)["params"]
    # bias the final conv positive so the relu head is alive at random init
    # (otherwise depth == 0 everywhere and the prompt gets no gradient)
    params["head"]["head_conv3"]["bias"] = jnp.full_like(
        params["head"]["head_conv3"]["bias"], 0.5)
    return model, params


@pytest.mark.slow
def test_visual_prompt_trainer_reduces_loss(rng):
    """VP-mode test-time optimisation drives the combined loss down on a
    tiny random VDA (depth_trainer.py:51-144 semantics)."""
    from trajectorycrafter_tpu.depth_alignment import DepthAlignmentTrainer

    model, params = _tiny_vda()
    frames = jnp.asarray(rng.standard_normal((2, 28, 28, 3), dtype=np.float32))
    target = jnp.asarray(rng.random((2, 28, 28), dtype=np.float32) + 0.5)
    mask = jnp.ones((2, 28, 28))

    trainer = DepthAlignmentTrainer(model, params, lr=5e-2)
    d, prompt, scale, shift, = (*trainer.train(frames, target, mask, epochs=8),)
    assert d.shape == (2, 28, 28)
    losses = trainer._last_losses
    assert losses[-1] < losses[0]  # optimisation made progress
    assert float(jnp.abs(prompt).max()) > 0.0  # the prompt moved


@pytest.mark.slow
def test_ft_mode_updates_params_not_prompt(rng):
    import jax
    from trajectorycrafter_tpu.depth_alignment import DepthAlignmentTrainer

    model, params = _tiny_vda()
    frames = jnp.asarray(rng.standard_normal((2, 28, 28, 3), dtype=np.float32))
    target = jnp.asarray(rng.random((2, 28, 28), dtype=np.float32) + 0.5)
    mask = jnp.ones((2, 28, 28))
    trainer = DepthAlignmentTrainer(model, params, lr=1e-3, mode="FT")
    d, prompt, _, _ = trainer.train(frames, target, mask, epochs=3)
    assert float(jnp.abs(prompt).max()) == 0.0  # prompt frozen in FT
