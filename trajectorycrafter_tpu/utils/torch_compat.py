"""Torch-RNG noise compatibility shim (SURVEY.md section 7 'RNG parity').

Bit-comparable outputs against the reference at fixed seeds require the same
initial gaussian latents the torch pipeline draws
(pipeline_trajectorycrafter.py:431 via torch.Generator).  When torch (CPU)
is available, this module reproduces those draws exactly; the pipeline
accepts the result through its ``latents=`` argument.

The reference samples noise in (B, F, C, h, w) order; our latents are
channel-last (B, F, h, w, C), so the draw happens in torch's layout and is
transposed after -- the VALUES per logical element match the reference.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def torch_randn(shape: Tuple[int, ...], seed: int) -> np.ndarray:
    """Exactly torch.randn(shape, generator=manual_seed(seed)) as numpy."""
    import torch

    gen = torch.Generator(device="cpu").manual_seed(seed)
    return torch.randn(shape, generator=gen).numpy()


def reference_initial_latents(
    batch: int, latent_frames: int, channels: int, h: int, w: int, seed: int
) -> np.ndarray:
    """Initial denoise latents matching the reference's draw at ``seed``,
    returned channel-last (B, F, h, w, C)."""
    bcfhw = torch_randn((batch, latent_frames, channels, h, w), seed)
    return np.moveaxis(bcfhw, 2, -1)


def reference_generator_sequence(
    batch: int,
    latent_frames: int,
    channels: int,
    h: int,
    w: int,
    seed: int,
    num_step_draws: int = 0,
) -> Tuple[np.ndarray, np.ndarray | None]:
    """The reference pipeline's full *explicit-generator* draw sequence:
    the initial latents (prepare_latents, :431) followed by one
    ``randn_tensor(latents.shape, generator=...)`` per denoise step for
    stochastic samplers ('Euler A' -- prepare_extra_step_kwargs forwards the
    generator into scheduler.step).  Returns channel-last
    ``(init_latents (B,F,h,w,C), step_noises (S,B,F,h,w,C) | None)``."""
    import torch

    gen = torch.Generator(device="cpu").manual_seed(seed)
    shape = (batch, latent_frames, channels, h, w)
    init = torch.randn(shape, generator=gen).numpy()
    steps = None
    if num_step_draws > 0:
        steps = np.stack(
            [torch.randn(shape, generator=gen).numpy() for _ in range(num_step_draws)]
        )
        steps = np.moveaxis(steps, 3, -1)
    return np.moveaxis(init, 2, -1), steps


def reference_condition_noise(
    batch: int,
    ref_latent_frames: int,
    latent_channels: int,
    latent_h: int,
    latent_w: int,
    frames: int,
    height: int,
    width: int,
    seed: int,
    video_latent_frames: int | None = None,
) -> Tuple[np.ndarray, ...]:
    """The reference pipeline's *global*-RNG draws at ``torch.manual_seed(seed)``,
    in draw order (pipeline_trajectorycrafter.py):

      1. ref-clip posterior noise -- ``DiagonalGaussianDistribution.sample()``
         with no generator, one (1, C, Fr', h, w) draw per batch element
         (the bs=1 encode loop at :883-887);
      2. (strength < 1 only) warped-video posterior noise -- the
         prepare_latents encode loop (:414-421), one (1, C, F', h, w) draw
         per batch element; request it with ``video_latent_frames``;
      3. noise-aug gaussian -- ``torch.randn_like(masked_image)`` of shape
         (B, 3, F, H, W) inside add_noise_to_reference_video (:163-176).

    Returns channel-last arrays for TrajCrafterPipeline's ``noise_override``
    hook: (ref_noise, aug_noise) or (ref_noise, vid_noise, aug_noise)."""
    import torch

    torch.manual_seed(seed)
    refs = [
        torch.randn((1, latent_channels, ref_latent_frames, latent_h, latent_w))
        for _ in range(batch)
    ]
    ref = torch.cat(refs, dim=0).numpy()
    vid = None
    if video_latent_frames is not None:
        vids = [
            torch.randn((1, latent_channels, video_latent_frames, latent_h,
                         latent_w))
            for _ in range(batch)
        ]
        vid = torch.cat(vids, dim=0).numpy()
    aug = torch.randn((batch, 3, frames, height, width)).numpy()
    if vid is None:
        return np.moveaxis(ref, 1, -1), np.moveaxis(aug, 1, -1)
    return (np.moveaxis(ref, 1, -1), np.moveaxis(vid, 1, -1),
            np.moveaxis(aug, 1, -1))
