"""End-to-end conditional video-diffusion pipeline (jit-compiled).

TPU-native redesign of the reference TrajCrafter_Pipeline
(/root/reference/models/pipeline_trajectorycrafter.py:674-1216):

  * condition prep (VAE encodes of reference clip + masked warped video,
    latent-space mask resize, noise aug) is one jit program;
  * the 50-step CFG denoise loop runs as a ``lax.fori_loop`` chunked into
    a few dispatches (``steps_per_dispatch``): each chunk is one XLA
    execution with a *dynamic* start index, so every chunk shares one
    compiled program and the chain is numerically identical to a single
    monolithic loop.  Chunking costs nothing (async dispatch keeps the
    device saturated) and bounds the wall-clock of any one execution --
    long single executions can trip runtime/relay watchdogs, and chunk
    boundaries are natural preemption/progress points.  The CFG pair
    rides the batch axis (uncond/cond stacked), so a 2-way data mesh
    axis shards it across chips with zero code change;
  * VAE decode streams through ``lax.scan`` chunks (models/vae.py).

Inputs are channel-last: video (B, F, H, W, 3) in [0, 1], mask_video
(B, F, H, W, 1) in [0, 255] where 255 marks holes (reference demo.py:120),
reference (B, F_ref, H, W, 3) in [0, 1].
"""

from __future__ import annotations

import contextlib
import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.models.vae import (
    AutoencoderKLCogVideoX,
    posterior_mode,
    sample_posterior,
    vae_decode,
    vae_decode_auto,
    vae_encode,
)
from trajectorycrafter_tpu.ops.resize import resize_linear, resize_mask_latent
from trajectorycrafter_tpu.ops.rope import rope_for_sample
from trajectorycrafter_tpu.schedulers.ddim import DDIMScheduler
from trajectorycrafter_tpu.schedulers.dpm import DPMSolverMultistepScheduler
from trajectorycrafter_tpu.schedulers.euler import (
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
)
from trajectorycrafter_tpu.schedulers.pndm import PNDMScheduler


@dataclass
class TrajCrafterPipeline:
    """Bundles models + params + scheduler; all heavy stages are jitted."""

    vae: AutoencoderKLCogVideoX
    vae_params: Any
    transformer: CrossTransformer3DModel
    transformer_params: Any
    scheduler: Any  # one of the schedulers module classes
    vae_scale_factor_spatial: int = 8
    vae_scale_factor_temporal: int = 4
    dtype: Any = jnp.bfloat16
    mesh: Any = None  # jax.sharding.Mesh with (dp, sp, tp) axes, or None

    # ------------------------------------------------------------------
    def with_mesh(self, mesh) -> "TrajCrafterPipeline":
        """Return a copy sharded over ``mesh`` (dp x sp x tp).

        DiT params are placed tensor-parallel (parallel/sharding.py rules),
        activation constraints are enabled inside the model (video tokens on
        sp, CFG pair / batch on dp), and self-attention switches to the ring
        kernel when sp > 1.  The reference has no inference parallelism at
        all (SURVEY.md parallelism inventory) -- this is the TPU-native
        scale-out path.
        """
        from trajectorycrafter_tpu.parallel import dit_param_sharding
        from trajectorycrafter_tpu.utils.offload import host_or_device

        sp = mesh.shape.get("sp", 1)
        transformer = self.transformer.clone(
            shard_activations=True,
            attention_impl="ring" if sp > 1 else self.transformer.attention_impl,
        )
        # sharded runs keep params resident (offload is a single-small-chip
        # concern); place any StageParams straight from host so no chip ever
        # holds the full unsharded tree alongside its shard
        tp0 = host_or_device(self.transformer_params)
        vp0 = host_or_device(self.vae_params)
        t_params = jax.device_put(tp0, dit_param_sharding(tp0, mesh))
        repl = NamedSharding(mesh, PartitionSpec())
        vae_params = jax.device_put(vp0, jax.tree.map(lambda _: repl, vp0))
        return dataclasses.replace(
            self, transformer=transformer, transformer_params=t_params,
            vae_params=vae_params, mesh=mesh,
        )

    def _mesh_ctx(self):
        return jax.set_mesh(self.mesh) if self.mesh is not None else contextlib.nullcontext()

    def _put_cfg_batch(self, x):
        """Place a CFG-pair-batched array on the dp axis (replicate otherwise)."""
        if self.mesh is None:
            return x
        return jax.device_put(
            x, NamedSharding(self.mesh,
                             PartitionSpec("dp", *([None] * (x.ndim - 1)))),
        )

    # ------------------------------------------------------------------
    def prepare_conditions(
        self,
        video: jnp.ndarray,  # (B, F, H, W, 3) warped render in [0, 1]
        mask_video: jnp.ndarray,  # (B, F, H, W, 1) 255 = hole
        reference: jnp.ndarray,  # (B, F_ref, H, W, 3) in [0, 1]
        key: jax.Array,
        noise_aug_strength: float = 0.0563,
        noise_override: Optional[Tuple] = None,
    ):
        """-> (inpaint_latents (B,F',h,w,17), ref_latents (B,Fr',h,w,16)).

        ``noise_override=(ref_noise, aug_noise)`` (channel-last arrays) is the
        RNG-parity hook: inject torch-generated gaussians so outputs bit-match
        the reference pipeline at a fixed torch seed
        (utils/torch_compat.reference_condition_noise)."""
        from trajectorycrafter_tpu.utils.offload import resolve

        shard = self.mesh is not None
        if noise_override is None:
            return _prepare_conditions_jit(
                self.vae, resolve(self.vae_params), video, mask_video, reference,
                key, noise_aug_strength,
                self.transformer.add_noise_in_inpaint_model,
                self.vae.scaling_factor, self.dtype, shard=shard,
            )
        # 2-tuple (ref, aug) or 3-tuple (ref, video, aug) in the reference's
        # global-RNG draw order; the middle draw feeds the strength<1 path
        ref_noise, aug_noise = noise_override[0], noise_override[-1]
        return _prepare_conditions_override_jit(
            self.vae, resolve(self.vae_params), video, mask_video, reference,
            jnp.asarray(ref_noise, jnp.float32), jnp.asarray(aug_noise, jnp.float32),
            noise_aug_strength, self.transformer.add_noise_in_inpaint_model,
            self.vae.scaling_factor, self.dtype, shard=shard,
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt_embeds: jnp.ndarray,  # (B, 226, 4096)
        negative_prompt_embeds: jnp.ndarray,  # (B, 226, 4096)
        video: jnp.ndarray,
        mask_video: jnp.ndarray,
        reference: jnp.ndarray,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        key: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        strength: float = 1.0,
        noise_aug_strength: float = 0.0563,
        output_type: str = "np",
        steps_per_dispatch: int = 5,
        noise_override: Optional[Tuple] = None,
        ancestral_noise_override: Optional[jnp.ndarray] = None,
    ):
        """Full sampling run; returns (B, F, H, W, 3) video in [0, 1].

        ``strength`` < 1 is the reference's img2img mode (pipeline:383-457,
        664-672): the first ``N - int(N * strength)`` denoise steps are
        skipped and the initial latents are the VAE-encoded warped video
        noised to the first kept timestep.  ``latents``, when given, plays
        the role of the initial *noise* draw (as in the reference's
        ``prepare_latents``).
        """
        from trajectorycrafter_tpu.utils.offload import release, resolve

        if key is None:
            key = jax.random.PRNGKey(0)
        key_cond, key_noise, key_vid, key_step = jax.random.split(key, 4)

        b, f, h, w, _ = video.shape
        f_lat = (f - 1) // self.vae_scale_factor_temporal + 1
        h_lat = h // self.vae_scale_factor_spatial
        w_lat = w // self.vae_scale_factor_spatial

        with self._mesh_ctx():
            inpaint_latents, ref_latents = self.prepare_conditions(
                video, mask_video, reference, key_cond, noise_aug_strength,
                noise_override=noise_override,
            )

        if latents is None:
            shape = (b, f_lat, h_lat, w_lat, self.vae.latent_channels)
            latents = jax.random.normal(key_noise, shape, jnp.float32)

        do_cfg = guidance_scale > 1.0
        state = self.scheduler.set_timesteps(num_inference_steps)

        # img2img timestep truncation (reference get_timesteps, pipeline:664-672)
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        if init_timestep == 0:
            # the reference fails loudly here too (empty timestep tensor);
            # without this, timesteps[t_start] would clamp out of bounds and
            # the un-denoised input would decode as the "generated" video
            raise ValueError(
                f"strength={strength} truncates every denoise step "
                f"(int({num_inference_steps} * {strength}) == 0); raise "
                "strength or num_inference_steps")
        t_start = max(num_inference_steps - init_timestep, 0)
        if t_start == 0:
            latents = latents * state.init_noise_sigma
        else:
            if isinstance(self.scheduler, PNDMScheduler):
                raise NotImplementedError(
                    "strength < 1 is not supported with the PNDM sampler "
                    "(its PRK warmup is incompatible with timestep skipping)"
                )
            vid_noise = None
            if noise_override is not None and len(noise_override) == 3:
                vid_noise = jnp.asarray(noise_override[1], jnp.float32)
            with self._mesh_ctx():
                if vid_noise is None:
                    video_latents = _encode_video_latents_jit(
                        self.vae, resolve(self.vae_params), video, key_vid,
                        self.vae.scaling_factor, self.dtype,
                    )
                else:
                    video_latents = _encode_video_latents_override_jit(
                        self.vae, resolve(self.vae_params), video, vid_noise,
                        self.vae.scaling_factor, self.dtype,
                    )
            latents = self.scheduler.add_noise(
                state, video_latents.astype(jnp.float32), latents,
                state.timesteps[t_start],
            )

        # The raw conditioning videos are consumed: drop the references so
        # their device buffers free before the denoise/decode stages.  At
        # production scale these are ~2.2 GB of fp32 ((1,49,384,672,3) video
        # + mask + reference) that __call__ would otherwise pin for its whole
        # body -- observed on chip as a decode RESOURCE_EXHAUSTED right after
        # the DiT release (the one-shot 49-frame decode wants nearly all of
        # HBM, and passes standalone on an empty chip).
        video = mask_video = reference = None

        rope = None
        if self.transformer.use_rotary_positional_embeddings:
            cos, sin = rope_for_sample(
                self.transformer.attention_head_dim, h, w, f_lat,
                self.vae_scale_factor_spatial, self.transformer.patch_size,
            )
            rope = (jnp.asarray(cos), jnp.asarray(sin))

        if do_cfg:
            text = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            inpaint_in = jnp.concatenate([inpaint_latents] * 2, axis=0)
            ref_in = jnp.concatenate([ref_latents] * 2, axis=0)
        else:
            text = prompt_embeds
            inpaint_in = inpaint_latents
            ref_in = ref_latents

        # place the CFG pair on the dp axis; the video-token sequence is
        # constrained to sp inside the transformer (models/dit.py)
        text = self._put_cfg_batch(text.astype(self.dtype))
        inpaint_in = self._put_cfg_batch(inpaint_in.astype(self.dtype))
        ref_in = self._put_cfg_batch(ref_in.astype(self.dtype))

        with self._mesh_ctx():
            latents = _denoise_loop(
                self.transformer, resolve(self.transformer_params),
                self.scheduler, state,
                latents, text, inpaint_in, ref_in, rope, num_inference_steps,
                float(guidance_scale), bool(do_cfg), bool(use_dynamic_cfg), self.dtype,
                steps_per_dispatch=int(steps_per_dispatch),
                start_index=t_start, step_key=key_step,
                ancestral_noises=ancestral_noise_override,
            )
            # stage offload: drop the 12.2 GB DiT device copy before decode
            # so the decoder's up-block activations fit beside it
            latents.block_until_ready()
            release(self.transformer_params)

            if output_type == "latent":
                return latents
            # Snapshot the (few-MB) final latents on the host BEFORE the
            # decode attempt: after a decode RESOURCE_EXHAUSTED the backend
            # can stay in an exhausted state where even this small
            # device->host fetch fails (observed on chip 2026-08-20 through
            # the axon relay), which would strand the whole denoise result.
            # The sync round trip also drains the relay's async deletes from
            # the DiT release above before the decoder allocates.
            latents_host = np.asarray(latents)
            latents = None
            # One-shot vs strip-tiled is decided INSIDE vae_decode_auto from
            # an activation-peak estimate, BEFORE dispatch: a jit execution
            # that RESOURCE_EXHAUSTs mid-run poisons this backend (measured
            # on chip 2026-08-21: with 12 GB probed free and 1.7 GB of live
            # arrays, the failed one-shot decode left the process unable to
            # device_put even 8 MB), so a try/fallback cannot recover.
            frames = _decode_jit(self.vae, resolve(self.vae_params),
                                 jnp.asarray(latents_host),
                                 self.vae.scaling_factor, mesh=self.mesh)
            frames.block_until_ready()
            release(self.vae_params)
        return frames


# ----------------------------------------------------------------------------
# jitted stages (module/static args hashed by jit)
# ----------------------------------------------------------------------------


def _spatial_sharded(x):
    """Constrain (B, F, H, W, C) to H-on-dp, W-on-sp under the ambient mesh.

    The CogVideoX VAE is causal in TIME (scan-carried conv cache), so the
    parallel axes are spatial: GSPMD partitions the 3D convs with halo
    exchanges and turns GroupNorm's spatial reduction into a psum."""
    from trajectorycrafter_tpu.parallel.sharding import constrain

    return constrain(x, None, None, "dp", "sp", None)


def _prepare_conditions_core(
    vae, vae_params, video, mask_video, reference, ref_noise, aug_noise,
    noise_aug_strength, add_noise_aug, scaling_factor, dtype, shard=False,
):
    if shard:
        video = _spatial_sharded(video)
        mask_video = _spatial_sharded(mask_video)
        reference = _spatial_sharded(reference)
    f_lat = (video.shape[1] - 1) // 4 + 1
    h_lat = video.shape[2] // 8
    w_lat = video.shape[3] // 8

    # --- reference branch: VAE-encode first frames, posterior sample
    ref = reference.astype(jnp.float32) * 2.0 - 1.0
    ref_moments = vae_encode(vae, vae_params, ref.astype(dtype))
    ref_latents = sample_posterior(ref_moments.astype(jnp.float32), None,
                                   vae.latent_channels,
                                   noise=ref_noise) * scaling_factor

    # --- inpaint branch (reference pipeline:949-1028); binarize threshold is
    # 0.5 on the RAW [0,255] mask scale (mask_processor do_binarize,
    # reference pipeline:238-243)
    init_video = video.astype(jnp.float32) * 2.0 - 1.0
    mask01 = (mask_video.astype(jnp.float32) >= 0.5).astype(jnp.float32)
    masked_video = init_video * (mask01 < 0.5) + (-1.0) * (mask01 > 0.5)
    if add_noise_aug:
        noise = aug_noise * noise_aug_strength
        noise = jnp.where(masked_video == -1.0, 0.0, noise)
        masked_video = masked_video + noise
    mv_moments = vae_encode(vae, vae_params, masked_video.astype(dtype))
    masked_video_latents = posterior_mode(mv_moments.astype(jnp.float32),
                                          vae.latent_channels) * scaling_factor

    # latent-size mask: 1 - mask01 (known=1), first frame resized alone
    mask_bcfhw = jnp.moveaxis(1.0 - mask01, -1, 1)  # (B, 1, F, H, W)
    mask_latents = resize_mask_latent(mask_bcfhw, (f_lat, h_lat, w_lat))
    mask_latents = jnp.moveaxis(mask_latents, 1, -1) * scaling_factor  # (B,F',h,w,1)

    inpaint_latents = jnp.concatenate([mask_latents, masked_video_latents], axis=-1)
    return inpaint_latents.astype(dtype), ref_latents.astype(dtype)


@partial(jax.jit, static_argnames=("vae", "add_noise_aug", "dtype", "shard"))
def _prepare_conditions_jit(
    vae, vae_params, video, mask_video, reference, key,
    noise_aug_strength, add_noise_aug, scaling_factor, dtype, shard=False,
):
    key_ref, key_aug = jax.random.split(key)
    b, f_ref = reference.shape[:2]
    ref_shape = (b, (f_ref - 1) // 4 + 1, reference.shape[2] // 8,
                 reference.shape[3] // 8, vae.latent_channels)
    ref_noise = jax.random.normal(key_ref, ref_shape, jnp.float32)
    aug_noise = jax.random.normal(key_aug, video.shape, jnp.float32)
    return _prepare_conditions_core(
        vae, vae_params, video, mask_video, reference, ref_noise, aug_noise,
        noise_aug_strength, add_noise_aug, scaling_factor, dtype, shard=shard,
    )


@partial(jax.jit, static_argnames=("vae", "add_noise_aug", "dtype", "shard"))
def _prepare_conditions_override_jit(
    vae, vae_params, video, mask_video, reference, ref_noise, aug_noise,
    noise_aug_strength, add_noise_aug, scaling_factor, dtype, shard=False,
):
    return _prepare_conditions_core(
        vae, vae_params, video, mask_video, reference, ref_noise, aug_noise,
        noise_aug_strength, add_noise_aug, scaling_factor, dtype, shard=shard,
    )


def _encode_video_latents_core(vae, vae_params, video, noise, scaling_factor,
                               dtype):
    """img2img init: VAE-encode the warped video, posterior-sample (reference
    prepare_latents, pipeline:414-427); channel-last (B, F', h, w, C)."""
    init_video = video.astype(jnp.float32) * 2.0 - 1.0
    moments = vae_encode(vae, vae_params, init_video.astype(dtype))
    return sample_posterior(moments.astype(jnp.float32), None,
                            vae.latent_channels, noise=noise) * scaling_factor


@partial(jax.jit, static_argnames=("vae", "dtype"))
def _encode_video_latents_jit(vae, vae_params, video, key, scaling_factor, dtype):
    b, f = video.shape[:2]
    shape = (b, (f - 1) // 4 + 1, video.shape[2] // 8, video.shape[3] // 8,
             vae.latent_channels)
    noise = jax.random.normal(key, shape, jnp.float32)
    return _encode_video_latents_core(vae, vae_params, video, noise,
                                      scaling_factor, dtype)


@partial(jax.jit, static_argnames=("vae", "dtype"))
def _encode_video_latents_override_jit(vae, vae_params, video, noise,
                                       scaling_factor, dtype):
    return _encode_video_latents_core(vae, vae_params, video, noise,
                                      scaling_factor, dtype)


def _denoise_loop(
    transformer, params, scheduler, state, latents, text, inpaint, ref, rope,
    num_steps, guidance_scale, do_cfg, use_dynamic_cfg, dtype,
    steps_per_dispatch=5, start_index=0, step_key=None, ancestral_noises=None,
):
    """Run the sampling loop as ceil(loop_steps / steps_per_dispatch) XLA
    executions.  Every full-size chunk reuses ONE compiled program (the
    start index ``i0`` is a dynamic operand); a shorter final chunk (only
    when steps_per_dispatch doesn't divide the step count) compiles once
    more.  ``steps_per_dispatch <= 0`` means a single monolithic dispatch.
    ``start_index`` > 0 skips the first steps (img2img strength)."""
    is_dpm = isinstance(scheduler, DPMSolverMultistepScheduler)
    is_pndm = isinstance(scheduler, PNDMScheduler)
    loop_steps = scheduler.num_loop_steps(num_steps) if is_pndm else num_steps

    latents = latents.astype(jnp.float32)
    if is_pndm:
        carry = (latents, scheduler.init_loop_state(latents.shape, jnp.float32))
    elif is_dpm:
        carry = (latents, jnp.zeros_like(latents))
    else:
        carry = (latents,)

    if step_key is None:
        step_key = jax.random.PRNGKey(0)
    spd = steps_per_dispatch if steps_per_dispatch > 0 else loop_steps
    i0 = int(start_index)
    while i0 < loop_steps:
        chunk = min(spd, loop_steps - i0)
        carry = _denoise_chunk_jit(
            transformer, params, scheduler, state, carry, jnp.int32(i0),
            text, inpaint, ref, rope, num_steps, chunk,
            guidance_scale, do_cfg, use_dynamic_cfg, dtype, step_key,
            ancestral_noises, loop_start=int(start_index),
        )
        i0 += chunk
    return carry[0]


@partial(
    jax.jit,
    static_argnames=(
        "transformer", "scheduler", "num_steps", "chunk", "do_cfg",
        "use_dynamic_cfg", "dtype",
    ),
)
def _denoise_chunk_jit(
    transformer, params, scheduler, state, carry, i0, text, inpaint, ref, rope,
    num_steps, chunk, guidance_scale, do_cfg, use_dynamic_cfg, dtype,
    step_key, ancestral_noises=None, loop_start=0,
):
    is_dpm = isinstance(scheduler, DPMSolverMultistepScheduler)
    is_pndm = isinstance(scheduler, PNDMScheduler)
    is_ancestral = isinstance(scheduler, EulerAncestralDiscreteScheduler)

    def model_call(lat, i):
        lat_in = jnp.concatenate([lat] * 2, axis=0) if do_cfg else lat
        lat_in = scheduler.scale_model_input(state, lat_in, i)
        t = state.timesteps[i]
        tvec = jnp.broadcast_to(t, (lat_in.shape[0],)).astype(jnp.float32)
        noise_pred = transformer.apply(
            {"params": params},
            lat_in.astype(dtype), text, tvec,
            inpaint_latents=inpaint, cross_latents=ref, image_rotary_emb=rope,
        ).astype(jnp.float32)
        if do_cfg:
            uncond, cond = jnp.split(noise_pred, 2, axis=0)
            if use_dynamic_cfg:
                # cosine-power dynamic CFG (reference pipeline:1142-1156)
                g = 1.0 + guidance_scale * (
                    (1.0 - jnp.cos(jnp.pi * ((num_steps - t) / num_steps) ** 5.0)) / 2.0
                )
            else:
                g = guidance_scale
            noise_pred = uncond + g * (cond - uncond)
        return noise_pred

    if is_pndm:
        def body(i, carry):
            lat, loop = carry
            noise_pred = model_call(lat, i)
            lat, loop = scheduler.step(state, noise_pred, i, lat, loop)
            return (lat, loop)
    elif is_dpm:
        def body(i, carry):
            lat, prev_x0 = carry
            noise_pred = model_call(lat, i)
            lat, x0 = scheduler.step(state, noise_pred, i, lat,
                                     prev_x0=prev_x0, num_steps=num_steps,
                                     first_index=loop_start)
            return (lat, x0)
    elif is_ancestral:
        # 'Euler A': per-step gaussian derived from the step index so the
        # draw sequence is chunking-invariant (reference samples fresh noise
        # each scheduler.step with the pipeline generator).  An explicit
        # (S, *latents) override -- indexed by absolute step -- replays the
        # reference torch generator for fixed-seed parity.
        def body(i, carry):
            noise_pred = model_call(carry[0], i)
            if ancestral_noises is None:
                noise = jax.random.normal(
                    jax.random.fold_in(step_key, i), carry[0].shape, jnp.float32
                )
            else:
                noise = ancestral_noises[i].astype(jnp.float32)
            return (scheduler.step(state, noise_pred, i, carry[0], noise=noise),)
    else:
        def body(i, carry):
            noise_pred = model_call(carry[0], i)
            return (scheduler.step(state, noise_pred, i, carry[0]),)

    return jax.lax.fori_loop(i0, i0 + chunk, body, carry)


def _decode_jit(vae, vae_params, latents, scaling_factor, mesh=None):
    """Not itself jitted: ``vae_decode_auto`` may dispatch several jitted
    strip decodes when the frame is too large for one-shot decode (576x1024
    full-frame needs >16 GB of up-block activations).

    Under a mesh the latents are laid out H-on-dp / W-on-sp before decode:
    the jitted decoder inherits the operand sharding and GSPMD partitions
    the up-blocks spatially (per-device activations shrink by dp*sp, so a
    slice usually skips the strip tiling entirely)."""
    z = latents.astype(jnp.float32) / scaling_factor
    divisor = 1
    if mesh is not None:
        z = jax.device_put(z, NamedSharding(
            mesh, PartitionSpec(None, None, "dp", "sp", None)))
        divisor = mesh.size  # GSPMD shards the up-block activations
    frames = vae_decode_auto(vae, vae_params, z.astype(vae.dtype),
                             peak_divisor=divisor).astype(jnp.float32)
    return jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)
