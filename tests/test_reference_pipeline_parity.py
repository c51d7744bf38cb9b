"""Fixed-seed END-TO-END parity of pipelines/trajcrafter.py against the
reference's own TrajCrafter_Pipeline (pipeline_trajectorycrafter.py:674-1216),
executed for real with tests/diffusers_shim.py standing in for the diffusers
runtime (DiffusionPipeline base, CogVideoXDDIMScheduler, VaeImageProcessor,
randn_tensor, get_3d_rotary_pos_embed).

This closes the loop the per-model parity tests leave open: scheduler math,
mask binarize/resize, condition prep (ref-clip posterior sample, noise aug,
masked-video encode), CFG pairing, RoPE grid cropping, and the denoise-loop
ordering are all validated in one shot at a fixed seed -- the BASELINE.md
north star's "PSNR-matched outputs at fixed seeds".

RNG parity: the reference draws (1) the ref-clip posterior noise and (2) the
noise-aug gaussian from torch's *global* RNG, and the initial latents from the
explicit generator.  utils/torch_compat reproduces all three; our pipeline
takes them through ``latents=`` and ``noise_override=``.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

VAE_TINY = dict(
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

DIT_TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=9,  # 4 noise + (1 mask + 4 masked-video)
    out_channels=4,
    time_embed_dim=16,
    text_embed_dim=12,
    num_layers=4,
    sample_width=8,
    sample_height=8,
    sample_frames=9,
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=5,
    use_rotary_positional_embeddings=True,
    add_noise_in_inpaint_model=True,
    is_train_cross=True,
    cross_attn_in_channels=4,
    cross_attn_interval=2,
    cross_attn_dim_head=8,
    cross_attn_num_heads=2,
)

H = W = 32  # latent 4x4, token grid 2x2 per frame
F = 9  # -> 3 latent frames
F_REF = 5  # -> 2 ref latent frames
STEPS = 6
GUIDANCE = 6.0
GLOBAL_SEED = 7  # torch.manual_seed before the reference call
GEN_SEED = 43  # the explicit torch.Generator (reference demo.py:121)

SCHED_CFG = dict(  # CogVideoX-Fun scheduler config (reference demo.py:647-657)
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
    clip_sample=False,
    set_alpha_to_one=True,
    prediction_type="v_prediction",
    timestep_spacing="trailing",
    rescale_betas_zero_snr=True,
    snr_shift_scale=3.0,
)
# the subset of the checkpoint config EulerDiscreteScheduler.from_pretrained
# applies (unknown keys like snr_shift_scale are dropped by diffusers)
EULER_CFG = dict(
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
    prediction_type="v_prediction",
    timestep_spacing="trailing",
    steps_offset=0,
    rescale_betas_zero_snr=True,
)
# PNDM accepts neither rescale_betas_zero_snr nor snr_shift_scale; it does
# take the checkpoint's set_alpha_to_one=True.  skip_prk_steps is absent
# from the config -> diffusers default False -> full pseudo-RK4 warmup.
PNDM_CFG = dict(
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
    prediction_type="v_prediction",
    timestep_spacing="trailing",
    steps_offset=0,
    set_alpha_to_one=True,
)


@pytest.fixture(scope="module")
def ref_stack():
    from diffusers_shim import install  # tests/ dir on sys.path under pytest

    install()

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, os.path.join(REF, path))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # the pipeline does `from models.crosstransformer3d import ...`
    pkg = sys.modules.setdefault("models", types.ModuleType("models"))
    if not hasattr(pkg, "__path__"):
        pkg.__path__ = []
    dit_mod = load("models.crosstransformer3d", "models/crosstransformer3d.py")
    pkg.crosstransformer3d = dit_mod
    vae_mod = load("ref_vae_for_pipeline", "models/autoencoder_magvit.py")
    pipe_mod = load("ref_pipeline_trajectorycrafter",
                    "models/pipeline_trajectorycrafter.py")
    return types.SimpleNamespace(dit=dit_mod, vae=vae_mod, pipe=pipe_mod)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(11)
    return types.SimpleNamespace(
        video=rng.uniform(size=(1, 3, F, H, W)).astype(np.float32),
        mask=((rng.uniform(size=(1, 1, F, H, W)) > 0.6) * 255.0).astype(np.float32),
        ref_clip=rng.uniform(size=(1, 3, F_REF, H, W)).astype(np.float32),
        prompt=rng.standard_normal((1, 5, 12)).astype(np.float32),
        negative=rng.standard_normal((1, 5, 12)).astype(np.float32),
    )


@pytest.fixture(scope="module")
def ref_models(ref_stack):
    import torch

    torch.manual_seed(0)
    ref_vae = ref_stack.vae.AutoencoderKLCogVideoX(**VAE_TINY)
    ref_vae.eval()
    torch.manual_seed(1)
    ref_dit = ref_stack.dit.CrossTransformer3DModel(**DIT_TINY)
    ref_dit.eval()
    return types.SimpleNamespace(vae=ref_vae, dit=ref_dit)


def _run_reference(ref_stack, ref_models, inputs, strength, sampler="DDIM_Cog"):
    """Run the reference pipeline end-to-end -> final latents (B, F', C, h, w)."""
    import torch

    import diffusers.schedulers as shim_schedulers  # the shim

    if sampler == "Euler":
        scheduler = shim_schedulers.EulerDiscreteScheduler(**EULER_CFG)
    elif sampler == "Euler A":
        scheduler = shim_schedulers.EulerAncestralDiscreteScheduler(**EULER_CFG)
    elif sampler == "DPM++":
        scheduler = shim_schedulers.DPMSolverMultistepScheduler(**EULER_CFG)
    elif sampler == "PNDM":
        scheduler = shim_schedulers.PNDMScheduler(**PNDM_CFG)
    else:
        sched_cls = {"DDIM_Cog": shim_schedulers.CogVideoXDDIMScheduler,
                     "DDIM_Origin": shim_schedulers.DDIMScheduler}[sampler]
        scheduler = sched_cls(**SCHED_CFG)
    pipe = ref_stack.pipe.TrajCrafter_Pipeline(
        tokenizer=None, text_encoder=None, vae=ref_models.vae,
        transformer=ref_models.dit, scheduler=scheduler,
    )

    torch.manual_seed(GLOBAL_SEED)
    generator = torch.Generator("cpu").manual_seed(GEN_SEED)
    with torch.no_grad():
        out = pipe(
            prompt=None,
            negative_prompt=None,
            height=H,
            width=W,
            video=torch.from_numpy(inputs.video),
            mask_video=torch.from_numpy(inputs.mask),
            reference=torch.from_numpy(inputs.ref_clip),
            num_frames=F,
            num_inference_steps=STEPS,
            guidance_scale=GUIDANCE,
            strength=strength,
            generator=generator,
            prompt_embeds=torch.from_numpy(inputs.prompt),
            negative_prompt_embeds=torch.from_numpy(inputs.negative),
            output_type="latent",
            return_dict=True,
        ).videos
    return out.numpy()


def _our_pipeline(ref_models, sampler="DDIM_Cog"):
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.pipelines.trajcrafter import TrajCrafterPipeline
    from trajectorycrafter_tpu.schedulers import SCHEDULER_REGISTRY
    from trajectorycrafter_tpu.utils.convert import convert_dit, convert_vae

    our_sched = SCHEDULER_REGISTRY[sampler]()

    vae = AutoencoderKLCogVideoX(
        latent_channels=VAE_TINY["latent_channels"],
        block_out_channels=VAE_TINY["block_out_channels"],
        layers_per_block=VAE_TINY["layers_per_block"],
        norm_num_groups=VAE_TINY["norm_num_groups"],
    )
    vae_params = convert_vae(
        {k: v.numpy() for k, v in ref_models.vae.state_dict().items()},
        layers_per_block=VAE_TINY["layers_per_block"],
    )
    dit = CrossTransformer3DModel(
        num_attention_heads=DIT_TINY["num_attention_heads"],
        attention_head_dim=DIT_TINY["attention_head_dim"],
        in_channels=DIT_TINY["in_channels"],
        out_channels=DIT_TINY["out_channels"],
        time_embed_dim=DIT_TINY["time_embed_dim"],
        text_embed_dim=DIT_TINY["text_embed_dim"],
        num_layers=DIT_TINY["num_layers"],
        sample_width=DIT_TINY["sample_width"],
        sample_height=DIT_TINY["sample_height"],
        sample_frames=DIT_TINY["sample_frames"],
        max_text_seq_length=DIT_TINY["max_text_seq_length"],
        use_rotary_positional_embeddings=True,
        add_noise_in_inpaint_model=True,
        cross_attn_dim_head=DIT_TINY["cross_attn_dim_head"],
        cross_attn_num_heads=DIT_TINY["cross_attn_num_heads"],
        attention_impl="xla",
    )
    dit_params = convert_dit(
        {k: v.numpy() for k, v in ref_models.dit.state_dict().items()},
        num_layers=DIT_TINY["num_layers"],
        cross_attn_interval=DIT_TINY["cross_attn_interval"],
    )
    return TrajCrafterPipeline(
        vae=vae, vae_params=vae_params, transformer=dit,
        transformer_params=dit_params, scheduler=our_sched,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize(
    "sampler,strength",
    [("DDIM_Cog", 1.0), ("DDIM_Cog", 0.6), ("DDIM_Origin", 1.0),
     ("Euler", 1.0), ("Euler A", 1.0), ("DPM++", 1.0), ("DPM++", 0.6),
     ("PNDM", 1.0)],
)
@pytest.mark.slow
def test_full_pipeline_fixed_seed_parity(ref_stack, ref_models, inputs,
                                         sampler, strength):
    """Our jitted sampling chain reproduces the reference's final latents
    (strength=1: pure-noise init; strength=0.6: img2img init from the
    VAE-encoded warped video + truncated timesteps; DDIM_Origin is the
    reference CLI's default sampler, DDIM_Cog the SNR-shifted variant;
    Euler A additionally replays the per-step ancestral generator draws)."""
    from trajectorycrafter_tpu.utils import torch_compat

    ref_latents = _run_reference(ref_stack, ref_models, inputs, strength,
                                 sampler)

    pipeline = _our_pipeline(ref_models, sampler)
    f_lat = (F - 1) // 4 + 1
    init_latents, step_noises = torch_compat.reference_generator_sequence(
        1, f_lat, VAE_TINY["latent_channels"], H // 8, W // 8, GEN_SEED,
        num_step_draws=STEPS if sampler == "Euler A" else 0,
    )
    noise_override = torch_compat.reference_condition_noise(
        1, (F_REF - 1) // 4 + 1, VAE_TINY["latent_channels"], H // 8, W // 8,
        F, H, W, GLOBAL_SEED,
        video_latent_frames=None if strength >= 1.0 else f_lat,
    )

    ours = pipeline(
        prompt_embeds=jnp.asarray(inputs.prompt),
        negative_prompt_embeds=jnp.asarray(inputs.negative),
        video=jnp.asarray(np.moveaxis(inputs.video, 1, -1)),
        mask_video=jnp.asarray(np.moveaxis(inputs.mask, 1, -1)),
        reference=jnp.asarray(np.moveaxis(inputs.ref_clip, 1, -1)),
        num_inference_steps=STEPS,
        guidance_scale=GUIDANCE,
        strength=strength,
        latents=jnp.asarray(init_latents),
        noise_override=noise_override,
        ancestral_noise_override=(None if step_noises is None
                                  else jnp.asarray(step_noises)),
        output_type="latent",
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 2), ref_latents,
        atol=3e-4, rtol=1e-4,
    )
