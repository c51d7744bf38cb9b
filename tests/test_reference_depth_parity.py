"""Numerical parity of the DepthCrafter stack against executed torch code.

The reference's depth path (/root/reference/models/infer.py:9-31,52-92) is
the diffusers ``UNetSpatioTemporalConditionModel`` + SVD
``AutoencoderKLTemporalDecoder`` driven through the windowed DepthCrafter
pipeline.  tests/svd_torch_oracle.py transcribes those public diffusers
blocks (same state-dict names, same math); here both stacks are instantiated
tiny, the torch ``state_dict()`` flows through utils/convert.py, and forward
outputs must agree — the same executed-torch golden treatment the DiT/VAE
already have (round-3 verdict item #1).

Key sets are pinned to the *instantiated* torch ``state_dict().keys()`` via
RecordingDict: every checkpoint key must be consumed by the converter and
every converted param must come from the checkpoint.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

from diffusers_shim import install  # noqa: E402  (tests/ on sys.path)

install()

import svd_torch_oracle as oracle  # noqa: E402

from trajectorycrafter_tpu.models.depthcrafter import (  # noqa: E402
    UNetSpatioTemporalConditionModel,
)
from trajectorycrafter_tpu.models.svd_vae import (  # noqa: E402
    AutoencoderKLTemporalDecoder,
)
from trajectorycrafter_tpu.pipelines.depth import (  # noqa: E402
    DepthCrafterPipeline,
    svd_euler_scheduler,
)
from trajectorycrafter_tpu.utils.convert import (  # noqa: E402
    RecordingDict,
    convert_svd_unet,
    convert_svd_vae,
)

UNET_TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    num_attention_heads=(2, 2, 2, 2),
    cross_attention_dim=12,
    groups=4,
)
VAE_TINY = dict(block_out_channels=(32, 32, 64, 64), layers_per_block=2)


def _randomize_mix_factors(model):
    """torch inits every AlphaBlender mix_factor to a constant, which would
    let a flipped/switched blend pass parity (sigmoid(c) == sigmoid(c)); give
    each one a distinct value so the blend DIRECTION is tested too."""
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("time_mixer.mix_factor"):
                p.copy_(torch.empty(1).uniform_(-1.5, 1.5, generator=g))


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(0)
    unet = oracle.UNetSpatioTemporalConditionModel(**UNET_TINY)
    _randomize_mix_factors(unet)
    unet.eval()
    return unet


@pytest.fixture(scope="module")
def torch_vae():
    torch.manual_seed(1)
    vae = oracle.AutoencoderKLTemporalDecoder(**VAE_TINY)
    _randomize_mix_factors(vae)
    vae.eval()
    return vae


def _flax_unet_and_params(torch_unet):
    sd = RecordingDict({k: v.numpy() for k, v in torch_unet.state_dict().items()})
    params = convert_svd_unet(sd, layers_per_block=UNET_TINY["layers_per_block"])
    assert sd.consumed == set(sd.keys()), (
        f"converter missed keys: {sorted(set(sd.keys()) - sd.consumed)[:8]}")
    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=UNET_TINY["block_out_channels"],
        layers_per_block=UNET_TINY["layers_per_block"],
        num_attention_heads=UNET_TINY["num_attention_heads"],
        cross_attention_dim=UNET_TINY["cross_attention_dim"],
        norm_num_groups=UNET_TINY["groups"],
    )
    return unet, params


def _flax_vae_and_params(torch_vae):
    sd = RecordingDict({k: v.numpy() for k, v in torch_vae.state_dict().items()})
    params = convert_svd_vae(sd, layers_per_block=VAE_TINY["layers_per_block"])
    assert sd.consumed == set(sd.keys()), (
        f"converter missed keys: {sorted(set(sd.keys()) - sd.consumed)[:8]}")
    vae = AutoencoderKLTemporalDecoder(
        block_out_channels=VAE_TINY["block_out_channels"])
    return vae, params


@pytest.mark.slow
def test_convert_unet_param_shapes_match_flax_init(torch_unet):
    """Every converted leaf must match the flax init tree exactly (no silent
    broadcast / missing param)."""
    unet, params = _flax_unet_and_params(torch_unet)
    init = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 2, 1, UNET_TINY["cross_attention_dim"])),
        jnp.zeros((1, 3)))["params"]
    got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    want = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, init)
    assert got == want


@pytest.mark.slow
def test_unet_forward_parity(torch_unet, rng):
    b, f, h, w = 2, 3, 8, 8
    sample = rng.standard_normal((b, f, 8, h, w)).astype(np.float32)
    ctx = rng.standard_normal(
        (b, f, 1, UNET_TINY["cross_attention_dim"])).astype(np.float32)
    added = np.array([[6.0, 127.0, 0.02], [3.0, 80.0, 0.1]], np.float32)
    t_val = 0.25 * np.log(2.5)  # continuous SVD conditioning value

    with torch.no_grad():
        want = torch_unet(
            torch.from_numpy(sample), torch.tensor([t_val]),
            torch.from_numpy(ctx), torch.from_numpy(added)).numpy()

    unet, params = _flax_unet_and_params(torch_unet)
    got = np.asarray(unet.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(sample, 2, -1)),
        jnp.full((b,), t_val, jnp.float32),
        jnp.asarray(ctx), jnp.asarray(added)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 2), want,
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_svd_vae_encode_parity(torch_vae, rng):
    f, h, w = 3, 32, 32
    frames = rng.uniform(-1, 1, (f, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = torch_vae.encode_moments(torch.from_numpy(frames)).numpy()

    vae, params = _flax_vae_and_params(torch_vae)
    got = np.asarray(vae.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(frames, 1, -1))[None],
        method=AutoencoderKLTemporalDecoder.encode))[0]
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want,
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_svd_vae_decode_parity(torch_vae, rng):
    f, h, w = 3, 4, 4
    z = rng.standard_normal((f, 4, h, w)).astype(np.float32)
    with torch.no_grad():
        want = torch_vae.decode(torch.from_numpy(z), num_frames=f).numpy()

    vae, params = _flax_vae_and_params(torch_vae)
    got = np.asarray(vae.apply(
        {"params": params}, jnp.asarray(np.moveaxis(z, 1, -1))[None],
        method=AutoencoderKLTemporalDecoder.decode))[0]
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), want,
                               atol=5e-4, rtol=1e-3)


def test_svd_euler_schedule_parity():
    """Karras sigmas, continuous 0.25*log(sigma) timesteps, init_noise_sigma
    — flax schedulers/euler.py vs the transcribed diffusers scheduler."""
    ref = oracle.svd_euler_scheduler_torch()
    ref.set_timesteps(5)
    ours = svd_euler_scheduler()
    st = ours.set_timesteps(5)
    np.testing.assert_allclose(np.asarray(st.sigmas), ref.sigmas.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.timesteps),
                               ref.timesteps.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(st.init_noise_sigma),
                               float(ref.init_noise_sigma), rtol=1e-6)


@pytest.mark.slow
def test_windowed_pipeline_parity(torch_unet, torch_vae, rng):
    """Fixed-seed END-TO-END parity of pipelines/depth.py (windowed denoise +
    overlap chaining + decode) against the executed torch stack, matching the
    reference entry models/infer.py:52-92 at guidance 1.0."""
    f, h, w = 7, 64, 64  # 8x8 latents (4x4 bottoms out the 3-level UNet)
    steps, window, overlap = 2, 4, 2
    frames = rng.uniform(0, 1, (f, h, w, 3)).astype(np.float32)
    embeds = rng.standard_normal(
        (f, 1, UNET_TINY["cross_attention_dim"])).astype(np.float32)
    # three windows: starts 0, 2, 4 (stride = window - overlap = 2) -> 3 for
    # f=7?  starts = range(0, f-window+1=4, 2) = [0, 2] + tail catch-up? 2+4=6<7
    starts = list(range(0, max(f - window, 0) + 1, window - overlap))
    if starts[-1] + window < f:
        starts.append(f - window)
    lat_hw = (h // 8, w // 8)
    noises = [rng.standard_normal((window, *lat_hw, 4)).astype(np.float32)
              for _ in starts]

    want = oracle.run_depthcrafter_pipeline_torch(
        torch_unet, torch_vae, frames, embeds, steps, window, overlap,
        noises)

    unet, unet_params = _flax_unet_and_params(torch_unet)
    vae, vae_params = _flax_vae_and_params(torch_vae)
    pipe = DepthCrafterPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        dtype=jnp.float32)
    got = pipe(frames, num_inference_steps=steps, window_size=window,
               overlap=overlap, image_embeddings=embeds,
               window_noises=noises)

    assert want.shape == got.shape == (f, h, w)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
