"""Resize ops validated bit-for-bit against torch.nn.functional.interpolate
(torch CPU is a test-only dependency)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from trajectorycrafter_tpu.ops.resize import (
    resize_linear,
    resize_mask_latent,
    resize_nearest,
)


def test_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 3, 17, 23)).astype(np.float32)
    got = np.asarray(resize_linear(jnp.asarray(x), (9, 12), align_corners=False))
    want = F.interpolate(torch.from_numpy(x), size=(9, 12), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_bilinear_upscale_matches_torch(rng):
    x = rng.standard_normal((1, 3, 8, 11)).astype(np.float32)
    got = np.asarray(resize_linear(jnp.asarray(x), (19, 27), align_corners=False))
    want = F.interpolate(torch.from_numpy(x), size=(19, 27), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.slow
def test_trilinear_matches_torch(rng, align):
    x = rng.standard_normal((1, 2, 9, 12, 14)).astype(np.float32)
    got = np.asarray(resize_linear(jnp.asarray(x), (5, 6, 7), align_corners=align))
    want = F.interpolate(torch.from_numpy(x), size=(5, 6, 7), mode="trilinear",
                         align_corners=align).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 1, 15, 21)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (7, 33)))
    want = F.interpolate(torch.from_numpy(x), size=(7, 33), mode="nearest").numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_resize_mask_latent_matches_reference_scheme(rng):
    """First frame resized alone, remainder together (pipeline:127-160)."""
    mask = rng.uniform(size=(1, 1, 49, 24, 36)).astype(np.float32)
    got = np.asarray(resize_mask_latent(jnp.asarray(mask), (13, 6, 9)))
    t = torch.from_numpy(mask)
    first = F.interpolate(t[:, :, 0:1], size=(1, 6, 9), mode="trilinear", align_corners=False)
    rest = F.interpolate(t[:, :, 1:], size=(12, 6, 9), mode="trilinear", align_corners=False)
    want = torch.cat([first, rest], dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (1, 1, 13, 6, 9)
