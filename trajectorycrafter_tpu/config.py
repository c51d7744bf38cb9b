"""Unified configuration for every entry point.

The reference duplicates a ~170-line argparse block per entry script
(/root/reference/inference.py:8-172, inference_orbits.py:10-190,
inference_autoregressive.py:22-204).  Here a single dataclass is the source of
truth; the CLI builds the same flag surface from it (see ``cli.py``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class RenderConfig:
    """Camera / warping options (reference inference.py:37-68)."""

    radius_scale: float = 1.0
    camera: str = "traj"  # 'traj' | 'target'
    mode: str = "gradual"  # 'gradual' | 'direct' | 'bullet' | 'zoom'
    mask: bool = False  # clean (dilate) the disocclusion mask
    traj_txt: Optional[str] = None
    target_pose: Optional[Tuple[float, float, float, float, float]] = None
    near: float = 0.0001
    far: float = 10000.0
    anchor_idx: int = 0
    # intrinsics used by pose synthesis (reference demo.py:545-547)
    focal: float = 500.0
    cx: float = 512.0
    cy: float = 288.0


@dataclass
class DiffusionConfig:
    """Generative-core options (reference inference.py:70-132)."""

    model_name: str = "checkpoints/CogVideoX-Fun-V1.1-5b-InP"
    transformer_path: str = "checkpoints/TrajectoryCrafter"
    sampler_name: str = "DDIM_Origin"  # Euler|Euler A|DPM++|PNDM|DDIM_Cog|DDIM_Origin
    sample_size: Tuple[int, int] = (384, 672)  # (height, width)
    guidance_scale: float = 6.0
    num_inference_steps: int = 50
    prompt: Optional[str] = None
    negative_prompt: str = (
        "The video is not of a high quality, it has a low resolution. "
        "Watermark present in each frame. The background is solid. "
        "Strange body and strange trajectory. Distortion."
    )
    refine_prompt: str = (
        ". The video is of high quality, and the view is very clear. "
        "High quality, masterpiece, best quality, highres, ultra-detailed, "
        "fantastic."
    )
    blip_path: str = "checkpoints/blip2-opt-2.7b"
    noise_aug_strength: float = 0.0563
    # DEFAULT int8 since round 5: block attn/FF GEMMs run on the int8 MXU
    # (ops/int8.py; weights quantized at load, activations per-token).
    # Measured 13.6 -> 12.6 s/step at 49f@576x1024 and, at the deployed
    # scale, same-seed output parity vs bf16 of 40.3 dB PSNR overall /
    # 39.2 dB weakest-frame / 0.982 SSIM (bench_int8_ab.json, the automated
    # gate at --psnr_pass_db 35).  "none" (--quant none) restores bf16;
    # re-run `python bench_e2e.py --ab` after converting real checkpoints
    # to re-validate the gate on deployed weights.
    quant: str = "int8"
    # denoise steps per XLA execution (one compiled program, dynamic start
    # index). Bounds single-execution wall-clock -- long monolithic loops
    # can trip runtime watchdogs -- at zero throughput cost (async dispatch).
    # <= 0 = one monolithic dispatch.
    steps_per_dispatch: int = 5
    use_dynamic_cfg: bool = False
    torch_rng_compat: bool = False  # draw initial latents with torch's RNG
    ref_frames: int = 10  # reference frames fed to the Perceiver branch


@dataclass
class DepthConfig:
    """DepthCrafter options (reference inference.py:134-170)."""

    unet_path: str = "checkpoints/DepthCrafter"
    pre_train_path: str = "checkpoints/stable-video-diffusion-img2vid"
    num_inference_steps: int = 5
    guidance_scale: float = 1.0
    window_size: int = 110
    overlap: int = 25
    max_res: int = 1024
    seed: int = 42
    # "int8": the UNet's transformer GEMMs on the int8 MXU
    # (ops/int8.quantize_depth_unet_params; --quant_depth int8).  Separate
    # from diffusion.quant: depth drives all warp geometry, so flipping it
    # is a separate quality decision.
    quant: str = "none"


@dataclass
class ParallelConfig:
    """Device-mesh layout.  The reference is single-GPU (SURVEY.md section 2,
    'Parallelism inventory'); here multi-chip sharding is first-class."""

    dp: int = 1  # data axis (CFG pair / batch), DCN-friendly
    sp: int = 1  # sequence axis (video tokens), ICI
    tp: int = 1  # tensor axis (attention heads / mlp), ICI
    # dtype policy
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    remat: bool = False  # rematerialize DiT blocks (training)


@dataclass
class TrajCrafterConfig:
    """Top-level config = general + render + diffusion + depth + parallel."""

    # general (reference inference.py:11-35)
    video_path: Optional[str] = None
    out_dir: str = "./experiments/"
    exp_name: Optional[str] = None
    save_dir: str = "./experiments/run"
    seed: int = 43
    video_length: int = 49
    fps: int = 10
    stride: int = 1
    # fixed processing resolution of the warp stage (reference models/utils.py:32)
    warp_size: Tuple[int, int] = (576, 1024)  # (height, width)
    # opt-in dev mode: permit randomly-initialised models / pseudo text
    # embeddings / plane-depth stubs when checkpoints are missing.  Off by
    # default so a production run against an incomplete model dir fails with
    # an actionable error instead of quietly producing garbage.
    allow_dev_stubs: bool = False
    # stage-wise host offload of model params ("auto" | "stage" | "none"):
    # a real-weight bundle (~35 GB bf16) cannot co-reside in one v5e chip's
    # 16 GB HBM; "auto" offloads only when the loaded bundle exceeds ~80%
    # of device memory (utils/offload.py -- the reference's accelerate
    # CPU-offload hooks, models/infer.py:34-43, re-expressed for TPU)
    offload: str = "auto"

    render: RenderConfig = field(default_factory=RenderConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    depth: DepthConfig = field(default_factory=DepthConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "TrajCrafterConfig":
        return dataclasses.replace(self, **kw)


def flatten_overrides(cfg: TrajCrafterConfig, overrides: Sequence[str]) -> TrajCrafterConfig:
    """Apply ``section.key=value`` string overrides (e.g. from the CLI)."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        parts = key.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        cur = getattr(obj, parts[-1])
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        elif isinstance(cur, (tuple, list)) and cur is not None:
            val = type(cur)(type(cur[0])(x) for x in raw.split(","))
        else:
            val = raw
        setattr(obj, parts[-1], val)
    return cfg
