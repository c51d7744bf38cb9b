"""Numerical parity of models/vae.py + utils/convert.convert_vae against the
reference's own AutoencoderKLCogVideoX (autoencoder_magvit.py:1177 encode,
:1256 decode), executed for real via tests/diffusers_shim.py.

Covers the chunked-causal-cache streaming paths: encode runs the reference's
4-frame chunk loop vs our lax.scan carry; decode the 2-latent-frame loop.
Also pins ``expected_vae_keys`` to the instantiated reference
``state_dict().keys()`` (round-2 verdict item #1).
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

TINY = dict(
    in_channels=3,
    out_channels=3,
    block_out_channels=(8, 8, 16, 16),
    latent_channels=4,
    layers_per_block=1,
    norm_num_groups=4,
    temporal_compression_ratio=4,
    sample_height=16,
    sample_width=16,
)


@pytest.fixture(scope="module")
def ref_mod():
    from diffusers_shim import install  # tests/ dir is on sys.path under pytest

    install()
    spec = importlib.util.spec_from_file_location(
        "ref_autoencoder_magvit", os.path.join(REF, "models/autoencoder_magvit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_vae(ref_mod):
    import torch

    torch.manual_seed(0)
    model = ref_mod.AutoencoderKLCogVideoX(**TINY)
    model.eval()
    return model


def _flax_vae():
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX

    return AutoencoderKLCogVideoX(
        latent_channels=TINY["latent_channels"],
        block_out_channels=TINY["block_out_channels"],
        layers_per_block=TINY["layers_per_block"],
        norm_num_groups=TINY["norm_num_groups"],
    )


def _params(ref_vae):
    from trajectorycrafter_tpu.utils.convert import convert_vae

    return convert_vae(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()},
        layers_per_block=TINY["layers_per_block"],
    )


def test_expected_vae_keys_match_instantiated_reference(ref_vae):
    from trajectorycrafter_tpu.utils.convert import expected_vae_keys

    assert set(ref_vae.state_dict().keys()) == expected_vae_keys(
        block_out_channels=TINY["block_out_channels"],
        layers_per_block=TINY["layers_per_block"],
    )


@pytest.mark.parametrize("t", [9, 4])
def test_vae_encode_matches_reference(ref_vae, rng, t):
    """t=9 exercises first-chunk(5) + one 4-frame chunk; t=4 single chunk."""
    import torch

    from trajectorycrafter_tpu.models.vae import vae_encode

    video = rng.standard_normal((1, 3, t, 16, 16)).astype(np.float32)
    with torch.no_grad():
        posterior = ref_vae.encode(torch.from_numpy(video)).latent_dist
        ref_moments = posterior.parameters.numpy()  # (B, 2C, T', h, w)

    moments = vae_encode(
        _flax_vae(), _params(ref_vae), jnp.asarray(np.moveaxis(video, 1, -1))
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(moments), -1, 1), ref_moments, atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("t_lat", [3, 2])
@pytest.mark.slow
def test_vae_decode_matches_reference(ref_vae, rng, t_lat):
    """t_lat=3 exercises first-chunk(3) special case; t_lat=2 single chunk."""
    import torch

    from trajectorycrafter_tpu.models.vae import vae_decode

    z = rng.standard_normal((1, 4, t_lat, 2, 2)).astype(np.float32)
    with torch.no_grad():
        ref_dec = ref_vae.decode(torch.from_numpy(z)).sample.numpy()

    dec = vae_decode(
        _flax_vae(), _params(ref_vae), jnp.asarray(np.moveaxis(z, 1, -1))
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(dec), -1, 1), ref_dec, atol=2e-4, rtol=1e-4
    )


def test_vae_roundtrip_matches_reference(ref_vae, rng):
    """Full encode->mode->decode through both stacks agrees end-to-end."""
    import torch

    from trajectorycrafter_tpu.models.vae import (
        posterior_mode,
        vae_decode,
        vae_encode,
    )

    video = rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32)
    with torch.no_grad():
        posterior = ref_vae.encode(torch.from_numpy(video)).latent_dist
        ref_rec = ref_vae.decode(posterior.mode()).sample.numpy()

    model, params = _flax_vae(), _params(ref_vae)
    moments = vae_encode(model, params, jnp.asarray(np.moveaxis(video, 1, -1)))
    rec = vae_decode(
        model, params, posterior_mode(moments, TINY["latent_channels"])
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(rec), -1, 1), ref_rec, atol=5e-4, rtol=1e-4
    )
