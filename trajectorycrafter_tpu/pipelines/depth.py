"""DepthCrafter windowed video-depth pipeline (jit-compiled).

Replaces the reference's external-submodule pipeline behind the same
interface (models/infer.py:52-92 ``DepthCrafterDemo.infer``):
  * per-frame CLIP image embeddings + per-frame VAE conditioning latents;
  * EulerDiscrete (continuous Karras sigmas, v-prediction, SVD config)
    denoising of each temporal window (window 110 / overlap 25 defaults,
    inference.py:163-167), no CFG at guidance 1.0;
  * consecutive windows chain exactly like the public DepthCrafter pipeline
    (tencent/DepthCrafter depth_crafter_ppl.py; the reference consumes it as
    a non-vendored submodule, models/infer.py:9-10): later windows seed
    their overlap latents from the previous result re-noised to the first
    sigma, and finished windows overwrite-blend into the running result with
    a 0 -> 1 linear ramp across the overlap;
  * post-processing chain reproduced verbatim from models/infer.py:79-91:
    3-channel mean -> global min-max normalise -> x3900 -> 10000/d ->
    clip(near, far).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.models.clip import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPVisionModelWithProjection,
)
from trajectorycrafter_tpu.models.depthcrafter import UNetSpatioTemporalConditionModel
from trajectorycrafter_tpu.models.svd_vae import (
    AutoencoderKLTemporalDecoder,
    svd_decode_chunked,
    svd_encode_chunked,
)
from trajectorycrafter_tpu.ops.resize import resize_linear
from trajectorycrafter_tpu.schedulers.euler import EulerDiscreteScheduler


def svd_euler_scheduler() -> EulerDiscreteScheduler:
    """SVD/DepthCrafter scheduler configuration."""
    return EulerDiscreteScheduler(
        prediction_type="v_prediction",
        timestep_type="continuous",
        interpolation_type="linear",
        use_karras_sigmas=True,
        sigma_min=0.002,
        sigma_max=700.0,
        timestep_spacing="leading",
        steps_offset=1,
    )


@dataclass
class DepthCrafterPipeline:
    unet: UNetSpatioTemporalConditionModel
    unet_params: Any
    vae: AutoencoderKLTemporalDecoder
    vae_params: Any
    image_encoder: Optional[CLIPVisionModelWithProjection] = None
    image_encoder_params: Any = None
    scheduler: EulerDiscreteScheduler = None
    dtype: Any = jnp.bfloat16
    mesh: Any = None  # jax.sharding.Mesh with (dp, sp, ...) axes, or None

    def __post_init__(self):
        if self.scheduler is None:
            self.scheduler = svd_euler_scheduler()

    # ------------------------------------------------------------------
    def with_mesh(self, mesh) -> "DepthCrafterPipeline":
        """Return a copy sharded over ``mesh``.

        Depth is embarrassingly parallel over FRAMES (the SVD encoder is
        per-frame; the UNet/temporal-decoder mix frames through convs and
        temporal attention, which GSPMD turns into halo exchanges /
        collectives), so the window's frame axis rides dp and the latent
        rows ride sp.  Params replicate (the 1.5B-scale UNet fits per chip);
        the 29.5 s non-denoise tail this amortises is the round-3 Amdahl
        floor (VERDICT item #2)."""
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec

        from trajectorycrafter_tpu.utils.offload import StageParams

        repl = NamedSharding(mesh, PartitionSpec())
        # StageParams stay host-resident (offload mode): jit replicates them
        # at stage dispatch under the ambient mesh
        put = lambda tree: (
            tree if tree is None or isinstance(tree, StageParams)
            else jax.device_put(tree, jax.tree.map(lambda _: repl, tree)))
        return dataclasses.replace(
            self, mesh=mesh, unet_params=put(self.unet_params),
            vae_params=put(self.vae_params),
            image_encoder_params=put(self.image_encoder_params))

    def _mesh_ctx(self):
        import contextlib

        return (jax.set_mesh(self.mesh) if self.mesh is not None
                else contextlib.nullcontext())

    # ------------------------------------------------------------------
    def encode_image_embeddings(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames (F, H, W, 3) in [0,1] -> per-frame CLIP embeds (F, 1, D)."""
        if self.image_encoder is None:
            return jnp.zeros((frames.shape[0], 1, self.unet.cross_attention_dim))
        from trajectorycrafter_tpu.utils.offload import release, resolve

        size = self.image_encoder.cfg.image_size
        x = resize_linear(jnp.moveaxis(frames, -1, 1), (size, size))
        x = jnp.moveaxis(x, 1, -1)
        x = (x - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
        # One jit program (NOT eager): an eager ViT-H forward over 49 frames
        # dispatches op-by-op, and the async stream keeps several layers'
        # ~830 MB attention-score tensors live at once -- observed on chip
        # as a nondeterministic RESOURCE_EXHAUSTED mid-encoder.  Under jit,
        # XLA schedules the layers sequentially and reuses the temp buffers.
        emb = _clip_embed_jit(self.image_encoder,
                              resolve(self.image_encoder_params), x)
        emb.block_until_ready()
        release(self.image_encoder_params)
        return emb[:, None, :]

    # ------------------------------------------------------------------
    def __call__(
        self,
        frames: np.ndarray,  # (F, H, W, 3) in [0, 1]
        num_inference_steps: int = 5,
        guidance_scale: float = 1.0,
        window_size: int = 110,
        overlap: int = 25,
        key: Optional[jax.Array] = None,
        image_embeddings: Optional[np.ndarray] = None,
        window_noises: Optional[list] = None,
    ) -> np.ndarray:
        """-> raw single-channel disparity (F, H, W), pre-normalisation.

        ``image_embeddings`` (F, 1, D) bypasses the CLIP encoder;
        ``window_noises`` supplies per-window init noise (parity tests share
        it with the executed torch oracle, tests/svd_torch_oracle.py)."""
        if key is None:
            key = jax.random.PRNGKey(42)
        frames = jnp.asarray(frames, jnp.float32)
        f, h, w, _ = frames.shape
        window_size = min(window_size, f)
        stride = max(window_size - overlap, 1)

        from trajectorycrafter_tpu.utils.offload import release, resolve

        if image_embeddings is not None:
            ctx = jnp.asarray(image_embeddings).astype(self.dtype)
        else:
            ctx = self.encode_image_embeddings(frames).astype(self.dtype)
        sharded = self.mesh is not None
        # per-frame conditioning latents (SVD convention: un-scaled mode),
        # frame-chunked: one-shot encode of 49 full-res frames OOMs 16 GB HBM
        with self._mesh_ctx():
            moments = svd_encode_chunked(
                self.vae, resolve(self.vae_params),
                (frames * 2.0 - 1.0)[None].astype(self.dtype),
                shard=sharded,
            )[0]
        cond_latents = moments[..., : self.vae.latent_channels].astype(jnp.float32)

        state = self.scheduler.set_timesteps(num_inference_steps)
        added = jnp.asarray([[6.0, 127.0, 0.02]])  # fps, motion bucket, noise aug

        starts = list(range(0, max(f - window_size, 0) + 1, stride))
        if starts[-1] + window_size < f:
            starts.append(f - window_size)

        # windowed denoise with the public DepthCrafter chaining scheme
        # (tencent/DepthCrafter depth_crafter_ppl.py): each later window's
        # overlap latents start from the PREVIOUS window's denoised latents
        # re-noised to the first sigma, and the finished window is
        # overwrite-blended into the running result with a 0 -> 1 linear ramp
        # over the overlap (first overlap frame keeps the old window, the
        # last is fully the new one -- continuous into the fresh frames).
        latents_all = jnp.zeros((f,) + cond_latents.shape[1:], jnp.float32)
        prev_start = None
        for wi, s in enumerate(starts):
            key, sub = jax.random.split(key)
            win_cond = cond_latents[s : s + window_size]
            win_ctx = ctx[s : s + window_size]
            if window_noises is not None:
                noise = jnp.asarray(window_noises[wi], jnp.float32)
            else:
                noise = jax.random.normal(sub, win_cond.shape, jnp.float32)
            init = noise * state.init_noise_sigma
            # positional overlap with the previous window (handles the
            # non-uniform catch-up window at the video tail)
            ov = 0
            if prev_start is not None:
                ov = min(max(prev_start + window_size - s, 0), window_size)
            if ov > 0:
                # seed overlapping frames from the already-blended result for
                # those SAME global frames, re-noised to the start sigma
                anchor = latents_all[s : s + ov]
                reno = anchor + noise[:ov] * state.init_noise_sigma
                init = jnp.concatenate([reno, init[ov:]], axis=0)
            with self._mesh_ctx():
                win_lat = _denoise_window_jit(
                    self.unet, resolve(self.unet_params), self.scheduler, state,
                    init, win_cond, win_ctx, added, num_inference_steps,
                    float(guidance_scale), self.dtype, shard=sharded,
                )
            latents_all = chain_blend(latents_all, win_lat, s, ov)
            prev_start = s
        # stage offload: drop the UNet before the (activation-heavy) decode
        latents_all.block_until_ready()
        release(self.unet_params)
        with self._mesh_ctx():
            dec = svd_decode_chunked(
                self.vae, resolve(self.vae_params),
                (latents_all[None] / self.vae.scaling_factor).astype(self.dtype),
                shard=sharded,
            )[0].astype(jnp.float32)
        dec = jnp.clip(dec / 2.0 + 0.5, 0.0, 1.0)
        release(self.vae_params)
        return np.asarray(jnp.mean(dec, axis=-1))  # (F, H, W)


@partial(jax.jit, static_argnames=("model",))
def _clip_embed_jit(model, params, x):
    return model.apply({"params": params}, x)


def chain_blend(latents_all: jnp.ndarray, win_lat: jnp.ndarray, s: int,
                ov: int) -> jnp.ndarray:
    """Overwrite-blend a finished window into the running latents: the first
    ``ov`` frames ramp linearly from the existing result (w=0) to the new
    window (w=1); the rest is taken from the new window verbatim (the public
    DepthCrafter scheme -- torch.linspace(0, 1, overlap) weights)."""
    if ov > 0:
        w = jnp.linspace(0.0, 1.0, ov)[:, None, None, None]
        blended = win_lat[:ov] * w + latents_all[s : s + ov] * (1.0 - w)
        win_lat = jnp.concatenate([blended, win_lat[ov:]], axis=0)
    return latents_all.at[s : s + win_lat.shape[0]].set(win_lat)


@partial(jax.jit, static_argnames=("unet", "scheduler", "num_steps",
                                   "guidance_scale", "dtype", "shard"))
def _denoise_window_jit(unet, params, scheduler, state, latents, cond_latents,
                        ctx, added, num_steps, guidance_scale, dtype,
                        shard=False):
    """Full Euler denoise of one window as a single fori_loop program.

    guidance_scale > 1 runs SVD-style CFG: the unconditional branch gets
    zeroed CLIP embeddings and zeroed conditioning latents.

    ``shard``: constrain the window's frame axis to dp and the latent rows
    to sp under the ambient mesh; GSPMD partitions the UNet's spatial work
    per frame/row and turns the temporal mixing into collectives.

    The sharded path UNROLLS the (static, small -- 5 by default) step loop
    instead of using fori_loop: XLA's SPMD partitioner miscompiles this
    UNet inside a while loop when the sharded carry's bottleneck spatial
    extent drops to one element per shard (stride-2 down path + repeat
    upsample; observed err O(1) on an 8-device CPU mesh, jax 0.9, both
    GSPMD and Shardy) -- the identical body unrolled is exact.
    """
    do_cfg = guidance_scale > 1.0
    if shard:
        from trajectorycrafter_tpu.parallel.sharding import constrain

        latents = constrain(latents, "dp", "sp", None, None)
        cond_latents = constrain(cond_latents, "dp", "sp", None, None)

    def body(i, lat):
        scaled = scheduler.scale_model_input(state, lat, i)
        if do_cfg:
            x_in = jnp.stack([
                jnp.concatenate([scaled, jnp.zeros_like(cond_latents)], axis=-1),
                jnp.concatenate([scaled, cond_latents], axis=-1),
            ])
            ctx_in = jnp.stack([jnp.zeros_like(ctx), ctx])
            t = jnp.broadcast_to(state.timesteps[i], (2,))
            added_in = jnp.concatenate([added] * 2, axis=0)
            pred = unet.apply(
                {"params": params}, x_in.astype(dtype), t, ctx_in, added_in,
            ).astype(jnp.float32)
            pred = pred[0] + guidance_scale * (pred[1] - pred[0])
        else:
            x_in = jnp.concatenate([scaled, cond_latents], axis=-1)[None]
            t = jnp.broadcast_to(state.timesteps[i], (1,))
            pred = unet.apply(
                {"params": params}, x_in.astype(dtype), t, ctx[None], added,
            )[0].astype(jnp.float32)
        return scheduler.step(state, pred, i, lat)

    if shard:
        lat = latents
        for i in range(num_steps):
            lat = body(i, lat)
        return lat
    return jax.lax.fori_loop(0, num_steps, body, latents)


def postprocess_depth(raw: np.ndarray, near: float, far: float) -> np.ndarray:
    """Reference post-processing chain, verbatim (models/infer.py:79-91)."""
    d = (raw - raw.min()) / max(raw.max() - raw.min(), 1e-12)
    d = d * 3900.0
    d = np.where(d < 1e-5, 1e-5, d)
    d = 10000.0 / d
    return np.clip(d, near, far)


class DepthCrafterDemo:
    """Reference-compatible facade (models/infer.py:12-92)."""

    def __init__(self, pipeline: DepthCrafterPipeline):
        self.pipe = pipeline

    def infer(self, frames, near, far, num_denoising_steps=5, guidance_scale=1.0,
              window_size=110, overlap=25, seed=42, track_time=False):
        raw = self.pipe(
            frames,
            num_inference_steps=num_denoising_steps,
            guidance_scale=guidance_scale,
            window_size=window_size,
            overlap=overlap,
            key=jax.random.PRNGKey(seed),
        )
        depth = postprocess_depth(raw, near, far)
        return depth[:, None]  # (F, 1, H, W)
