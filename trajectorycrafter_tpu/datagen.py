"""Training-data generation (SURVEY 2.19).

Rebuild of notebooks/22_10_25_scaling_up/generate_sceneflow.py: produce
paired (warped, ground-truth) latent samples from datasets with known depth
and camera motion (SceneFlow/Monkaa/Driving, TartanAir lists) for the LoRA
trainer: smart-resize to the diffusion sample size (:33-114), warp the
source view, VAE-encode everything to latents
(encode_inputs_to_latents :228) and store .npz samples consumable by
training/data.py.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from trajectorycrafter_tpu.models.vae import (
    AutoencoderKLCogVideoX,
    posterior_mode,
    vae_encode,
)
from trajectorycrafter_tpu.ops.resize import resize_linear, resize_nearest
from trajectorycrafter_tpu.ops.splat import forward_warp_batch
from trajectorycrafter_tpu.training.data import save_latent_sample


def smart_resize(frames: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize + centre crop to (h, w)
    (reference generate_sceneflow.py:33-114)."""
    h, w = frames.shape[1:3]
    oh, ow = out_hw
    scale = max(oh / h, ow / w)
    rh, rw = int(round(h * scale)), int(round(w * scale))
    x = jnp.moveaxis(jnp.asarray(frames), -1, 1)
    x = resize_linear(x, (rh, rw))
    x = np.asarray(jnp.moveaxis(x, 1, -1))
    top = (rh - oh) // 2
    left = (rw - ow) // 2
    return x[:, top : top + oh, left : left + ow]


def encode_sample(
    vae: AutoencoderKLCogVideoX,
    vae_params,
    gt_frames: np.ndarray,  # (F, H, W, 3) in [0, 1] target-view ground truth
    warped_frames: np.ndarray,  # (F, H, W, 3) in [0, 1] warped render
    masks: np.ndarray,  # (F, H, W) 1 = known
    prompt_embeds: np.ndarray,  # (L, D)
    ref_frames: Optional[np.ndarray] = None,  # defaults to first 10 gt frames
):
    """-> dict of channel-last latents for one training sample
    (keys match training/data.py / the reference's latents dataset)."""
    from trajectorycrafter_tpu.ops.resize import resize_mask_latent

    scaling = vae.scaling_factor
    f = gt_frames.shape[0]
    f_lat = (f - 1) // 4 + 1
    h_lat, w_lat = gt_frames.shape[1] // 8, gt_frames.shape[2] // 8

    def enc(v, mode=True):
        m = vae_encode(vae, vae_params, jnp.asarray(v * 2.0 - 1.0)[None])
        z = posterior_mode(m.astype(jnp.float32), vae.latent_channels)
        return np.asarray(z[0] * scaling)

    gt_lat = enc(gt_frames)
    masked = warped_frames.copy()
    masked[masks < 0.5] = 0.0  # holes to mid-gray in [0,1] space == -1 in [-1,1]
    mv_lat = enc(masked)
    if ref_frames is None:
        ref_frames = gt_frames[:10]
    ref_lat = enc(ref_frames)

    mask_b = jnp.asarray(masks, jnp.float32)[None, None]  # (1,1,F,H,W)
    mask_lat = resize_mask_latent(mask_b, (f_lat, h_lat, w_lat))
    mask_lat = np.asarray(jnp.moveaxis(mask_lat, 1, -1)[0]) * scaling
    inpaint = np.concatenate([mask_lat, mv_lat], axis=-1)

    return {
        "gt_latents": gt_lat.astype(np.float32),
        "ref_latents": ref_lat.astype(np.float32),
        "inpaint_latents": inpaint.astype(np.float32),
        "prompt_embeds": prompt_embeds.astype(np.float32),
    }


def generate_pair_from_depth(
    frames: np.ndarray,  # (F, H, W, 3) source view in [0, 1]
    depths: np.ndarray,  # (F, H, W) metric depth
    pose_s: np.ndarray,  # (F, 4, 4)
    pose_t: np.ndarray,  # (F, 4, 4)
    K: np.ndarray,  # (F, 3, 3)
):
    """Warp source->target with ground-truth geometry -> (warped, masks)."""
    warped, masks, _, _ = forward_warp_batch(
        jnp.asarray(frames * 2.0 - 1.0), jnp.asarray(depths),
        jnp.asarray(pose_s), jnp.asarray(pose_t), jnp.asarray(K),
    )
    return (np.asarray(warped) + 1.0) / 2.0, np.asarray(masks)


def generate_dataset(
    vae, vae_params, out_dir: str, clips, prompt_embeds: np.ndarray,
    sample_size: Tuple[int, int] = (384, 672),
):
    """clips: iterable of (gt_frames, src_frames, depths, pose_s, pose_t, K)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, (gt, src, depth, ps, pt, K) in enumerate(clips):
        warped, masks = generate_pair_from_depth(src, depth, ps, pt, K)
        gt_r = smart_resize(gt, sample_size)
        warped_r = smart_resize(warped, sample_size)
        masks_r = np.asarray(
            resize_nearest(jnp.asarray(masks)[:, None], sample_size)
        )[:, 0]
        sample = encode_sample(vae, vae_params, gt_r, warped_r, masks_r,
                               prompt_embeds)
        save_latent_sample(os.path.join(out_dir, f"sample_{i:06d}.npz"), **sample)
    return out_dir
