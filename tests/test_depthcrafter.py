"""Tests for the DepthCrafter stack (tiny configs, CPU): SVD UNet forward,
temporal-decoder VAE roundtrip shapes, CLIP parity vs transformers, and the
windowed depth pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.models.clip import CLIPVisionConfig, CLIPVisionModelWithProjection
from trajectorycrafter_tpu.models.depthcrafter import UNetSpatioTemporalConditionModel
from trajectorycrafter_tpu.models.svd_vae import AutoencoderKLTemporalDecoder
from trajectorycrafter_tpu.pipelines.depth import (
    DepthCrafterDemo,
    DepthCrafterPipeline,
    postprocess_depth,
    svd_euler_scheduler,
)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(8, 16, 16, 16),
        layers_per_block=1,
        num_attention_heads=(2, 2, 2, 2),
        cross_attention_dim=16,
        norm_num_groups=4,
    )
    sample = jnp.zeros((1, 3, 16, 16, 8))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 3, 1, 16))
    added = jnp.zeros((1, 3))
    params = unet.init(jax.random.PRNGKey(0), sample, t, ctx, added)["params"]
    return unet, params


@pytest.mark.slow
def test_unet_forward_shape(tiny_unet, rng):
    unet, params = tiny_unet
    sample = jnp.asarray(rng.standard_normal((1, 3, 16, 16, 8)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 3, 1, 16)).astype(np.float32))
    out = unet.apply({"params": params}, sample, jnp.asarray([0.5]), ctx,
                     jnp.asarray([[6.0, 127.0, 0.02]]))
    assert out.shape == (1, 3, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_unet_temporal_mixing(tiny_unet, rng):
    """Changing one frame must propagate to others (temporal layers work)."""
    unet, params = tiny_unet
    sample = np.asarray(rng.standard_normal((1, 3, 16, 16, 8)).astype(np.float32))
    ctx = jnp.zeros((1, 3, 1, 16))
    added = jnp.asarray([[6.0, 127.0, 0.02]])
    out1 = np.asarray(unet.apply({"params": params}, jnp.asarray(sample),
                                 jnp.asarray([0.5]), ctx, added))
    sample2 = sample.copy()
    sample2[:, 2] += 1.0
    out2 = np.asarray(unet.apply({"params": params}, jnp.asarray(sample2),
                                 jnp.asarray([0.5]), ctx, added))
    assert np.abs(out1[:, 0] - out2[:, 0]).max() > 1e-6  # frame 0 affected


@pytest.fixture(scope="module")
def tiny_svd_vae():
    vae = AutoencoderKLTemporalDecoder(latent_channels=4)
    v = jnp.zeros((1, 2, 32, 32, 3))
    # tiny channel config via module attributes not exposed; use defaults but
    # small spatial size keeps this fast enough on CPU
    vae_small = AutoencoderKLTemporalDecoder(latent_channels=4)
    params = vae_small.init(jax.random.PRNGKey(0), v)["params"]
    return vae_small, params


@pytest.mark.slow
def test_svd_vae_roundtrip_shapes(tiny_svd_vae, rng):
    vae, params = tiny_svd_vae
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 2, 32, 32, 3)).astype(np.float32))
    m = vae.apply({"params": params}, frames,
                  method=AutoencoderKLTemporalDecoder.encode)
    assert m.shape == (1, 2, 4, 4, 8)
    dec = vae.apply({"params": params}, m[..., :4],
                    method=AutoencoderKLTemporalDecoder.decode)
    assert dec.shape == (1, 2, 32, 32, 3)


@pytest.mark.slow
def test_svd_vae_chunked(tiny_svd_vae, rng):
    """Frame-chunked encode is EXACT vs one-shot (per-frame encoder); chunked
    decode matches the one-shot decode on the frames whose temporal
    neighbourhood stays within the chunk."""
    from trajectorycrafter_tpu.models.svd_vae import (
        svd_decode_chunked,
        svd_encode_chunked,
    )

    vae, params = tiny_svd_vae
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 5, 32, 32, 3)).astype(np.float32))
    want = np.asarray(vae.apply({"params": params}, frames,
                                method=AutoencoderKLTemporalDecoder.encode))
    got = np.asarray(svd_encode_chunked(vae, params, frames, chunk=2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    z = jnp.asarray(rng.standard_normal((1, 5, 4, 4, 4)).astype(np.float32))
    full = np.asarray(vae.apply({"params": params}, z,
                                method=AutoencoderKLTemporalDecoder.decode))
    dec = np.asarray(svd_decode_chunked(vae, params, z, chunk=2))
    assert dec.shape == full.shape
    assert np.all(np.isfinite(dec))
    # within-chunk time mixing: random weights mix untrained temporal
    # branches, so only a coarse correlation with the one-shot decode is a
    # meaningful invariant (same rationale as test_tiled_decode_close_to_full)
    corr = np.corrcoef(dec.reshape(-1), full.reshape(-1))[0, 1]
    assert corr > 0.5, corr
    # f <= chunk falls back to the one-shot program bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(svd_decode_chunked(vae, params, z, chunk=8)), full)
    # the final partial chunk decodes at its TRUE length (published
    # decode_chunk_size loop), not replicate-padded: frame 4 of [2,2,1]
    # chunking == a direct 1-frame decode
    last = np.asarray(vae.apply({"params": params}, z[:, 4:],
                                method=AutoencoderKLTemporalDecoder.decode))
    np.testing.assert_array_equal(dec[:, 4:], last)


def test_clip_parity_vs_transformers(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14, projection_dim=16,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px)).image_embeds.numpy()

    from trajectorycrafter_tpu.utils.convert import convert_clip_vision

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(sd, num_layers=2)
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=28, patch_size=14,
                           projection_dim=16)
    model = CLIPVisionModelWithProjection(cfg)
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(np.moveaxis(px, 1, -1))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_windowed_depth_pipeline(tiny_unet, tiny_svd_vae):
    unet, unet_params = tiny_unet
    vae, vae_params = tiny_svd_vae
    # cross_attention_dim=16; no CLIP encoder -> zero embeddings
    pipe = DepthCrafterPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        dtype=jnp.float32,
    )
    frames = np.random.default_rng(0).uniform(0, 1, (7, 64, 64, 3)).astype(np.float32)
    raw = pipe(frames, num_inference_steps=2, window_size=4, overlap=2)
    assert raw.shape == (7, 64, 64)
    assert np.all(np.isfinite(raw))

    demo = DepthCrafterDemo(pipe)
    depth = demo.infer(frames, near=0.0001, far=10000.0, num_denoising_steps=2,
                       window_size=4, overlap=2)
    assert depth.shape == (7, 1, 64, 64)
    assert depth.min() >= 0.0001 and depth.max() <= 10000.0


def test_postprocess_depth_chain():
    raw = np.array([[0.0, 0.5], [1.0, 0.25]], np.float32)[None]
    d = postprocess_depth(raw, near=0.1, far=1000.0)
    # max raw -> disparity 3900 -> depth 10000/3900 ~ 2.564
    np.testing.assert_allclose(d[0, 1, 0], 10000.0 / 3900.0, rtol=1e-5)
    # min raw -> clipped to far
    assert d[0, 0, 0] == 1000.0


def test_svd_scheduler_matches_reference_config():
    s = svd_euler_scheduler()
    st = s.set_timesteps(5)
    assert float(st.sigmas[0]) == pytest.approx(700.0, rel=1e-5)


def test_chain_blend_matches_depthcrafter_scheme():
    """Overlap blend = new*w + old*(1-w), w = linspace(0,1,ov): first overlap
    frame keeps the old result, last is fully the new window, and the ramp is
    continuous into the non-overlap region (the round-1 accumulate/divide
    scheme capped the new window at weight 0.5 -- this pins the fix)."""
    import jax.numpy as jnp

    from trajectorycrafter_tpu.pipelines.depth import chain_blend

    f, c = 10, 1
    old = jnp.ones((f, 2, 2, c))
    new = jnp.full((6, 2, 2, c), 3.0)
    out = np.asarray(chain_blend(old, new, s=4, ov=3))
    w = np.linspace(0, 1, 3)
    np.testing.assert_allclose(out[4:7, 0, 0, 0], 3.0 * w + 1.0 * (1 - w))
    np.testing.assert_allclose(out[7:10], 3.0)  # rest of window overwritten
    np.testing.assert_allclose(out[:4], 1.0)  # untouched prefix
    # ov=0 (first window): pure overwrite
    out0 = np.asarray(chain_blend(old, new, s=0, ov=0))
    np.testing.assert_allclose(out0[:6], 3.0)


def test_encode_image_embeddings_jit_and_release(rng):
    """The CLIP embed path runs as ONE jit program and releases its stage
    params (eager ViT dispatch OOM'd the chip at full scale, round 5)."""
    from trajectorycrafter_tpu.utils.offload import StageParams

    cfg = CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=12)
    clip = CLIPVisionModelWithProjection(cfg)
    cp = jax.jit(clip.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sp = StageParams(jax.tree.map(np.asarray, cp), offload=True, name="clip")
    pipe = DepthCrafterPipeline(
        unet=UNetSpatioTemporalConditionModel(
            block_out_channels=(8, 16, 16, 16), layers_per_block=1,
            num_attention_heads=(2, 2, 2, 2), cross_attention_dim=12,
            norm_num_groups=4),
        unet_params=None, vae=None, vae_params=None,
        image_encoder=clip, image_encoder_params=sp)
    frames = jnp.asarray(rng.uniform(0, 1, (5, 24, 40, 3)), jnp.float32)
    emb = pipe.encode_image_embeddings(frames)
    assert emb.shape == (5, 1, 12)
    assert np.all(np.isfinite(np.asarray(emb)))
    # stage offload contract: the CLIP device tree is gone after the embed
    assert sp._device is None
