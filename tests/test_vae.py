"""Tests for the CogVideoX 3D causal VAE (tiny config, CPU).

Covers: shape contract (4x temporal, 8x8 spatial, 49->13->49), causal
streaming-cache equivalence, chunk-level causality, and the posterior helpers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.models.vae import (
    AutoencoderKLCogVideoX,
    CausalConv3d,
    posterior_mode,
    sample_posterior,
    vae_decode,
    vae_encode,
)

TINY = dict(
    latent_channels=4,
    block_out_channels=(8, 16, 16, 32),
    layers_per_block=1,
    norm_num_groups=4,
)


@pytest.fixture(scope="module")
def tiny_vae():
    model = AutoencoderKLCogVideoX(**TINY)
    x = jnp.zeros((1, 5, 32, 48, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


@pytest.mark.slow
def test_causal_conv_streaming_equivalence(rng):
    """Full-sequence causal conv == chunked with carried cache."""
    conv = CausalConv3d(6, (3, 3, 3))
    x = jnp.asarray(rng.standard_normal((1, 12, 8, 8, 4)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(1), x, None)["params"]
    full, _ = conv.apply({"params": params}, x, None)
    out1, cache = conv.apply({"params": params}, x[:, :5], None)
    out2, cache = conv.apply({"params": params}, x[:, 5:9], cache)
    out3, _ = conv.apply({"params": params}, x[:, 9:], cache)
    chunked = jnp.concatenate([out1, out2, out3], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


@pytest.mark.slow
def test_causal_conv_decomposed_matches_conv3d(rng):
    """The shifted-2D-conv lowering (TPU fast path, auto on-chip) matches
    the conv3d lowering on identical params -- same kernel layout, only the
    accumulation order differs."""
    x = jnp.asarray(rng.standard_normal((2, 7, 8, 10, 4)).astype(np.float32))
    conv3d = CausalConv3d(6, (3, 3, 3), decompose=False)
    conv2d = CausalConv3d(6, (3, 3, 3), decompose=True)
    params = conv3d.init(jax.random.PRNGKey(1), x, None)["params"]
    # identical param trees (checkpoint-interchangeable)
    p2 = conv2d.init(jax.random.PRNGKey(2), x, None)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    assert params["conv"]["kernel"].shape == p2["conv"]["kernel"].shape
    want, _ = conv3d.apply({"params": params}, x, None)
    got, cache = conv2d.apply({"params": params}, x, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # streaming cache is unaffected by the lowering
    out1, cache = conv2d.apply({"params": params}, x[:, :4], None)
    out2, _ = conv2d.apply({"params": params}, x[:, 4:], cache)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([out1, out2], axis=1)),
        np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_encode_decode_shapes_49(tiny_vae, rng):
    """49 frames -> 13 latent frames -> 49 frames (reference chunking)."""
    model, params = tiny_vae
    video = jnp.asarray(rng.uniform(-1, 1, (1, 49, 32, 48, 3)).astype(np.float32))
    moments = vae_encode(model, params, video)
    assert moments.shape == (1, 13, 4, 6, 2 * TINY["latent_channels"])
    z = posterior_mode(moments, TINY["latent_channels"])
    dec = vae_decode(model, params, z)
    assert dec.shape == (1, 49, 32, 48, 3)
    assert np.all(np.isfinite(np.asarray(dec)))


def test_encode_17_frames(tiny_vae, rng):
    """BASELINE config 2 clip length: 17 frames -> 5 latent frames."""
    model, params = tiny_vae
    video = jnp.asarray(rng.uniform(-1, 1, (1, 17, 32, 48, 3)).astype(np.float32))
    moments = vae_encode(model, params, video)
    assert moments.shape[1] == 5


def test_single_image_encode(tiny_vae, rng):
    model, params = tiny_vae
    video = jnp.asarray(rng.uniform(-1, 1, (1, 1, 32, 48, 3)).astype(np.float32))
    moments = vae_encode(model, params, video)
    assert moments.shape[1] == 1
    dec = vae_decode(model, params, posterior_mode(moments, 4))
    assert dec.shape[1] == 1


def test_chunk_causality(tiny_vae, rng):
    """Perturbing the last 4-frame chunk must not change earlier latents."""
    model, params = tiny_vae
    video = np.asarray(rng.uniform(-1, 1, (1, 49, 32, 48, 3)).astype(np.float32))
    m1 = np.asarray(vae_encode(model, params, jnp.asarray(video)))
    video2 = video.copy()
    video2[:, 45:] += 0.5
    m2 = np.asarray(vae_encode(model, params, jnp.asarray(video2)))
    np.testing.assert_allclose(m1[:, :12], m2[:, :12], atol=1e-5)
    assert np.abs(m1[:, 12] - m2[:, 12]).max() > 1e-3


def test_posterior_sample_stats(tiny_vae, rng):
    moments = jnp.concatenate(
        [jnp.full((1, 2, 4, 4, 4), 1.5), jnp.full((1, 2, 4, 4, 4), -30.0)], axis=-1
    )
    z = sample_posterior(moments, jax.random.PRNGKey(0), 4)
    np.testing.assert_allclose(np.asarray(z), 1.5, atol=1e-3)  # ~zero std
    assert np.allclose(np.asarray(posterior_mode(moments, 4)), 1.5)


@pytest.mark.slow
def test_tiled_decode_close_to_full(tiny_vae, rng):
    """Tiled decode with overlap blending ~= full decode away from seams."""
    from trajectorycrafter_tpu.models.vae import vae_decode_tiled

    model, params = tiny_vae
    z = jnp.asarray(rng.standard_normal((1, 2, 8, 12, 4)).astype(np.float32)) * 0.5
    full = np.asarray(vae_decode(model, params, z))
    tiled = np.asarray(vae_decode_tiled(model, params, z,
                                        tile_latent_height=6, tile_latent_width=6))
    assert tiled.shape == full.shape
    # tiles see different GroupNorm statistics than the full frame (same
    # approximation as the reference's tiled_decode), so equality is only
    # statistical: outputs stay correlated and finite
    assert np.all(np.isfinite(tiled))
    denom = np.abs(full).mean() + 1e-6
    assert np.abs(tiled - full).mean() / denom < 1.5
    # random weights amplify per-tile GroupNorm-stat differences; with
    # trained weights tiled ~= full (reference behaviour). Positive
    # correlation is the meaningful random-weight invariant.
    corr = np.corrcoef(tiled.reshape(-1), full.reshape(-1))[0, 1]
    assert corr > 0.2, corr


@pytest.mark.slow
def test_decode_auto_strips(tiny_vae, rng, monkeypatch):
    """vae_decode_auto: small frames one-shot; large frames full-width
    strips with vertical blending only, same output shape."""
    import trajectorycrafter_tpu.models.vae as vae_mod

    model, params = tiny_vae
    z = jnp.asarray(rng.standard_normal((1, 2, 8, 12, 4)).astype(np.float32)) * 0.5
    full = np.asarray(vae_decode(model, params, z))
    # below threshold -> identical to one-shot decode
    np.testing.assert_array_equal(
        np.asarray(vae_mod.vae_decode_auto(model, params, z)), full)
    # force the tiled path (threshold below this frame's 8*12 cells) with
    # 4-row strips -> 3 strips with real vertical blending
    monkeypatch.setattr(vae_mod, "_FULL_DECODE_MAX_CELLS", 50)
    strips = np.asarray(vae_mod.vae_decode_auto(model, params, z, strip_height=4))
    assert strips.shape == full.shape
    assert np.all(np.isfinite(strips))
    corr = np.corrcoef(strips.reshape(-1), full.reshape(-1))[0, 1]
    assert corr > 0.2, corr


def test_vae_decode_auto_tiles_before_dispatch(monkeypatch):
    """Full-scale shapes must choose the strip-tiled decoder UP FRONT (a
    mid-run RESOURCE_EXHAUSTED poisons remote backends -- round 5); tiny
    shapes stay one-shot; a sharded decode discounts by the mesh size."""
    import trajectorycrafter_tpu.models.vae as V

    calls = []
    monkeypatch.setattr(V, "vae_decode", lambda *a, **k: calls.append("full"))
    monkeypatch.setattr(V, "vae_decode_tiled",
                        lambda *a, **k: calls.append("tiled"))
    model = object.__new__(AutoencoderKLCogVideoX)  # shape-only use

    V.vae_decode_auto(model, None, jnp.zeros((1, 13, 48, 84, 16)))
    assert calls[-1] == "tiled"  # 49f@384x672 ~ 11 GB peak > 0.6 * 16 GB
    V.vae_decode_auto(model, None, jnp.zeros((1, 13, 72, 128, 16)))
    assert calls[-1] == "tiled"  # 49f@576x1024
    V.vae_decode_auto(model, None, jnp.zeros((1, 3, 8, 12, 16)))
    assert calls[-1] == "full"   # tiny dev shape
    V.vae_decode_auto(model, None, jnp.zeros((1, 13, 48, 84, 16)),
                      peak_divisor=8)
    assert calls[-1] == "full"   # 8-chip slice: per-device peak ~1.4 GB
