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
