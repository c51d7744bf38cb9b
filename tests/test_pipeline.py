"""End-to-end pipeline tests with tiny VAE + DiT (CPU).

Exercises the full conditional sampling path: VAE condition encodes, latent
mask prep, CFG denoise loop (every scheduler family), VAE decode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
from trajectorycrafter_tpu.pipelines import TrajCrafterPipeline
from trajectorycrafter_tpu.schedulers import (
    SCHEDULER_REGISTRY,
    CogVideoXDPMScheduler,
    DDIMScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
)

LC = 4  # tiny latent channels


def build_tiny_pipeline():
    vae = AutoencoderKLCogVideoX(
        latent_channels=LC, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, norm_num_groups=4,
    )
    vx = jnp.zeros((1, 5, 32, 48, 3), jnp.float32)
    vae_params = vae.init(jax.random.PRNGKey(0), vx)["params"]

    dit = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=16,
        in_channels=2 * LC + 1, out_channels=LC,
        time_embed_dim=16, text_embed_dim=32, num_layers=2,
        sample_width=12, sample_height=8, sample_frames=9,
        max_text_seq_length=7, cross_attn_dim_head=8, cross_attn_num_heads=4,
        use_rotary_positional_embeddings=True, attention_impl="xla",
        dtype=jnp.float32,
    )
    b, f, h, w = 1, 3, 4, 6
    hp = dit.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, f, h, w, LC)), jnp.zeros((b, 7, 32)), jnp.zeros((b,)),
        jnp.zeros((b, f, h, w, LC + 1)), jnp.zeros((b, 1, h, w, LC)),
        image_rotary_emb=(jnp.zeros((f * 2 * 3, 16)), jnp.zeros((f * 2 * 3, 16))),
    )["params"]

    sch = DDIMScheduler(prediction_type="v_prediction")
    return TrajCrafterPipeline(
        vae=vae, vae_params=vae_params, transformer=dit, transformer_params=hp,
        scheduler=sch, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def tiny_pipeline():
    return build_tiny_pipeline()


def _inputs(rng):
    video = jnp.asarray(rng.uniform(0, 1, (1, 9, 32, 48, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(1, 9, 32, 48, 1)) > 0.7).astype(np.float32) * 255.0
    )
    reference = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 48, 3)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((1, 7, 32)).astype(np.float32))
    ne = jnp.zeros_like(pe)
    return video, mask, reference, pe, ne


@pytest.mark.slow
def test_full_pipeline_ddim(tiny_pipeline, rng):
    video, mask, reference, pe, ne = _inputs(rng)
    out = tiny_pipeline(
        pe, ne, video, mask, reference,
        num_inference_steps=3, guidance_scale=6.0, key=jax.random.PRNGKey(43),
    )
    assert out.shape == (1, 9, 32, 48, 3)
    o = np.asarray(out)
    assert np.all(np.isfinite(o)) and o.min() >= 0.0 and o.max() <= 1.0


@pytest.mark.slow
def test_pipeline_no_cfg(tiny_pipeline, rng):
    video, mask, reference, pe, ne = _inputs(rng)
    out = tiny_pipeline(
        pe, ne, video, mask, reference,
        num_inference_steps=2, guidance_scale=1.0, key=jax.random.PRNGKey(0),
    )
    assert out.shape == (1, 9, 32, 48, 3)


@pytest.mark.slow
def test_pipeline_seed_determinism(tiny_pipeline, rng):
    video, mask, reference, pe, ne = _inputs(rng)
    a = tiny_pipeline(pe, ne, video, mask, reference, num_inference_steps=2,
                      key=jax.random.PRNGKey(7))
    b = tiny_pipeline(pe, ne, video, mask, reference, num_inference_steps=2,
                      key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = tiny_pipeline(pe, ne, video, mask, reference, num_inference_steps=2,
                      key=jax.random.PRNGKey(8))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


@pytest.mark.parametrize(
    "sch_cls,kw",
    [
        (CogVideoXDPMScheduler, {}),
        # 2 steps < the PRK warmup's minimum 4 -> exercise the PLMS-only form
        (PNDMScheduler, {"prediction_type": "v_prediction",
                         "skip_prk_steps": True}),
        (EulerDiscreteScheduler, {"timestep_spacing": "trailing"}),
        (EulerAncestralDiscreteScheduler, {"timestep_spacing": "trailing"}),
    ],
)
@pytest.mark.slow
def test_pipeline_other_schedulers(tiny_pipeline, rng, sch_cls, kw):
    import dataclasses

    pipe = dataclasses.replace(tiny_pipeline, scheduler=sch_cls(**kw))
    video, mask, reference, pe, ne = _inputs(rng)
    out = pipe(pe, ne, video, mask, reference, num_inference_steps=2,
               key=jax.random.PRNGKey(0))
    assert out.shape == (1, 9, 32, 48, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize(
    "sch_cls,kw",
    [
        (DDIMScheduler, {"prediction_type": "v_prediction"}),
        (CogVideoXDPMScheduler, {}),
        (PNDMScheduler, {"prediction_type": "v_prediction"}),
        (EulerDiscreteScheduler, {"timestep_spacing": "trailing"}),
        (EulerAncestralDiscreteScheduler, {"timestep_spacing": "trailing"}),
    ],
)
@pytest.mark.slow
def test_chunked_dispatch_matches_monolithic(tiny_pipeline, rng, sch_cls, kw):
    """steps_per_dispatch chunking is numerically identical to one dispatch
    for every scheduler family (incl. a non-dividing final partial chunk)."""
    import dataclasses

    pipe = dataclasses.replace(tiny_pipeline, scheduler=sch_cls(**kw))
    video, mask, reference, pe, ne = _inputs(rng)
    kwargs = dict(num_inference_steps=5, guidance_scale=6.0,
                  key=jax.random.PRNGKey(3), output_type="latent")
    mono = pipe(pe, ne, video, mask, reference, steps_per_dispatch=0, **kwargs)
    chunked = pipe(pe, ne, video, mask, reference, steps_per_dispatch=2, **kwargs)
    np.testing.assert_array_equal(np.asarray(mono), np.asarray(chunked))


def test_latent_output(tiny_pipeline, rng):
    video, mask, reference, pe, ne = _inputs(rng)
    lat = tiny_pipeline(pe, ne, video, mask, reference, num_inference_steps=2,
                        key=jax.random.PRNGKey(0), output_type="latent")
    assert lat.shape == (1, 3, 4, 6, LC)


@pytest.mark.slow
def test_strength_truncates_and_inits_from_video(tiny_pipeline, rng):
    """img2img strength: fewer denoise steps, video-latent init; PNDM raises."""
    import dataclasses

    video, mask, reference, pe, ne = _inputs(rng)
    kwargs = dict(num_inference_steps=4, guidance_scale=6.0,
                  key=jax.random.PRNGKey(9), output_type="latent")
    full = np.asarray(tiny_pipeline(pe, ne, video, mask, reference,
                                    strength=1.0, **kwargs))
    partial = np.asarray(tiny_pipeline(pe, ne, video, mask, reference,
                                       strength=0.5, **kwargs))
    assert partial.shape == full.shape
    assert np.all(np.isfinite(partial))
    assert np.abs(partial - full).max() > 1e-4  # genuinely different path

    pndm = dataclasses.replace(
        tiny_pipeline, scheduler=PNDMScheduler(prediction_type="v_prediction"))
    with pytest.raises(NotImplementedError):
        pndm(pe, ne, video, mask, reference, strength=0.5, **kwargs)

    # strength so small it truncates EVERY step must fail loudly (the
    # reference hits an empty timestep tensor); silently decoding the
    # un-denoised input is the failure mode being guarded
    with pytest.raises(ValueError, match="truncates every denoise step"):
        tiny_pipeline(pe, ne, video, mask, reference, strength=0.1,
                      **kwargs)  # int(4 * 0.1) == 0


@pytest.mark.slow
def test_registry_samplers_run_end_to_end(tiny_pipeline, rng):
    """Every CLI sampler-menu entry (reference inference.py:87) drives the
    full pipeline through the deployed registry factories."""
    import dataclasses

    video, mask, reference, pe, ne = _inputs(rng)
    for name, factory in SCHEDULER_REGISTRY.items():
        pipe = dataclasses.replace(tiny_pipeline, scheduler=factory())
        out = np.asarray(pipe(pe, ne, video, mask, reference,
                              num_inference_steps=4, guidance_scale=6.0,
                              key=jax.random.PRNGKey(43)))
        assert out.shape == (1, 9, 32, 48, 3), name
        assert np.all(np.isfinite(out)), name


@pytest.mark.slow
def test_euler_strength_truncation(tiny_pipeline, rng):
    """img2img strength with the Euler sampler: the sigma-space add_noise
    leg (timestep-valued) produces a finite, distinct trajectory."""
    import dataclasses

    pipe = dataclasses.replace(tiny_pipeline,
                               scheduler=SCHEDULER_REGISTRY["Euler"]())
    video, mask, reference, pe, ne = _inputs(rng)
    kwargs = dict(num_inference_steps=4, guidance_scale=6.0,
                  key=jax.random.PRNGKey(9), output_type="latent")
    full = np.asarray(pipe(pe, ne, video, mask, reference, strength=1.0, **kwargs))
    part = np.asarray(pipe(pe, ne, video, mask, reference, strength=0.5, **kwargs))
    assert np.all(np.isfinite(part))
    assert np.abs(part - full).max() > 1e-4


@pytest.mark.slow
def test_full_pipeline_int8_tracks_fp32(tiny_pipeline, rng):
    """quant="int8" end-to-end sampling stays close to the fp32 chain (the
    opt-in --quant int8 deployment; per-GEMM bounds in test_int8_dense)."""
    import dataclasses

    from trajectorycrafter_tpu.ops.int8 import quantize_dit_params

    video, mask, reference, pe, ne = _inputs(rng)
    kwargs = dict(num_inference_steps=4, guidance_scale=6.0,
                  key=jax.random.PRNGKey(7), output_type="latent")
    want = np.asarray(tiny_pipeline(pe, ne, video, mask, reference, **kwargs))

    pipe8 = dataclasses.replace(
        tiny_pipeline,
        transformer=tiny_pipeline.transformer.clone(quant="int8"),
        transformer_params=quantize_dit_params(tiny_pipeline.transformer_params),
    )
    got = np.asarray(pipe8(pe, ne, video, mask, reference, **kwargs))
    assert np.all(np.isfinite(got))
    cos = float((got * want).sum()
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12))
    assert cos > 0.99, f"int8 sampling diverged from fp32: cosine {cos}"
