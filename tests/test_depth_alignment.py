"""Tests for the consistent-depth alignment subsystem."""

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
