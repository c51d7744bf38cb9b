"""Real-TPU assertions for the VAE's decomposed causal-conv lowering
(pytest -m tpu).

The auto gate in models/vae.py lowers hot kt>1 causal convs as summed
shifted 2D convs only on the TPU backend (measured 1.2-1.3x at the
decoder's chunk shapes), so the default CPU suite never exercises the
decomposed path through a real Mosaic/XLA TPU compile.  These tests pin
the chip-compiled decomposed decode to the conv3d lowering at fixed seeds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform == "cpu",
        reason="needs the real TPU (run via tests/run_tpu_tests.sh)",
    ),
]

TINY = dict(
    latent_channels=4,
    block_out_channels=(8, 16, 16, 32),
    layers_per_block=1,
    norm_num_groups=4,
)


def test_decomposed_decode_matches_conv3d_on_chip(monkeypatch):
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX, vae_decode

    model = AutoencoderKLCogVideoX(**TINY)
    x = jnp.zeros((1, 5, 32, 48, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x)["params"])()
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 8, 12, 4), jnp.float32)

    monkeypatch.setenv("TRAJCRAFTER_CONV3D_IMPL", "decomposed")
    out_dec = np.asarray(jax.jit(vae_decode.__wrapped__, static_argnums=0)(model, params, z))
    monkeypatch.setenv("TRAJCRAFTER_CONV3D_IMPL", "conv3d")
    out_3d = np.asarray(jax.jit(vae_decode.__wrapped__, static_argnums=0)(model, params, z))

    assert np.isfinite(out_dec).all()
    # same params, same math; only the accumulation order differs (and TPU
    # convs truncate fp32 inputs to bf16, so rounding is bf16-scaled)
    np.testing.assert_allclose(out_dec, out_3d, atol=5e-2)
    rms = float(np.sqrt(((out_dec - out_3d) ** 2).mean()))
    assert rms < 2e-3, rms
