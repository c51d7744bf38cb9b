"""Full-scale END-TO-END orchestrator benchmark on one chip.

Runs the real ``TrajCrafter.infer_gradual`` path -- video read, depth
estimation (SVD UNet, windowed), forward-splat warp, T5 prompt encode,
50-step CFG denoise (42-block DiT), VAE decode, all five mp4 writes -- at
the production 384x672 diffusion / 576x1024 warp configuration, with
PRODUCTION-SHAPE synthetic weights (zero egress: the HF zoo is
unreachable, but every model is built at its real scale so compute and
memory are identical to a real-weight run).

This is the number ``bench.py`` composes from per-stage measurements
(bench_stages.json); here it is measured as ONE orchestrated run,
exercising stage offload (utils/offload.py) under real HBM pressure: the
bundle is ~25 GB of bf16 params on a 16 GB chip and only fits because each
model is device-placed for its stage and released after.

Synthetic weights regenerate ON DEVICE per stage (StageParams materialize
closures) -- pushing 25 GB host->device through the axon relay would
swamp the timing; on real hardware the host push is PCIe-fast and the
production path (StageParams host trees) is used instead.

Writes bench_e2e.json; bench.py reports it as
``e2e_sec_per_video_384x672_orchestrated`` when present.

Caption stage: fixed --prompt (the reference CLI equally accepts
--prompt and skips BLIP-2, demo.py:526-536); noted in the JSON.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import synth_params

# wall-clock per stage, accumulated across one orchestrated video (reset
# between the cold and warm runs so the committed breakdown is warm-run)
STAGE_T = {}


def _timed(name, fn):
    def wrapped(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        STAGE_T[name] = STAGE_T.get(name, 0.0) + time.time() - t0
        return out
    return wrapped


class _TimedPipeline:
    """Times __call__, delegates attribute access (orchestrator reads
    pipeline.vae.latent_channels)."""

    def __init__(self, inner):
        self._inner = inner

    def __call__(self, *a, **k):
        return _timed("diffusion", self._inner)(*a, **k)

    def __getattr__(self, n):
        return getattr(self._inner, n)


def staged_synth(model, example_args, dtype, name, seed):
    """StageParams that synthesises production-shape params on device."""
    from trajectorycrafter_tpu.utils.offload import StageParams

    return StageParams(
        materialize=_timed(f"synth_{name}", lambda: synth_params(
            model, example_args, jax.random.PRNGKey(seed), dtype)),
        offload=True, name=name,
    )


def build_full_scale_bundle(cfg, dtype=jnp.bfloat16):
    """ModelBundle with every model at its deployed scale, synthetic
    weights, stage offload ON (mirrors utils/checkpoints.load_full_bundle)."""
    from trajectorycrafter_tpu.models.clip import (
        CLIPVisionModelWithProjection,
        clip_vit_h14_config,
    )
    from trajectorycrafter_tpu.models.depthcrafter import (
        UNetSpatioTemporalConditionModel,
    )
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.models.svd_vae import AutoencoderKLTemporalDecoder
    from trajectorycrafter_tpu.models.t5 import T5EncoderModel, t5_xxl_config
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.orchestrator import ModelBundle
    from trajectorycrafter_tpu.pipelines.depth import (
        DepthCrafterDemo,
        DepthCrafterPipeline,
    )
    from trajectorycrafter_tpu.pipelines.trajcrafter import TrajCrafterPipeline
    from trajectorycrafter_tpu.schedulers import SCHEDULER_REGISTRY
    from trajectorycrafter_tpu.utils.offload import release, resolve

    # --- diffusion stack (bench.py main's deployed shapes) -----------------
    vae = AutoencoderKLCogVideoX(dtype=dtype, param_dtype=dtype)
    vae_sp = staged_synth(vae, (jnp.zeros((1, 1, 8, 8, 3), dtype),),
                          dtype, "vae", 0)
    dit = CrossTransformer3DModel(
        num_attention_heads=48, attention_head_dim=64, num_layers=42,
        max_text_seq_length=226, use_rotary_positional_embeddings=True,
        attention_impl="flash", quant=cfg.diffusion.quant,
        dtype=dtype, param_dtype=dtype,
    )
    dit_args = (
        jnp.zeros((1, 2, 16, 24, 16), dtype), jnp.zeros((1, 226, 4096), dtype),
        jnp.zeros((1,)), jnp.zeros((1, 2, 16, 24, 17), dtype),
        jnp.zeros((1, 1, 16, 24, 16), dtype),
    )
    dit_sp = staged_synth(dit, dit_args, dtype, "dit", 1)
    scheduler = SCHEDULER_REGISTRY[cfg.diffusion.sampler_name]()
    pipeline = TrajCrafterPipeline(
        vae=vae, vae_params=vae_sp, transformer=dit, transformer_params=dit_sp,
        scheduler=scheduler, dtype=dtype,
    )

    # --- T5-XXL prompt encoder (4.7B) --------------------------------------
    t5 = T5EncoderModel(t5_xxl_config(), dtype=dtype, param_dtype=dtype)
    t5_sp = staged_synth(t5, (jnp.zeros((1, 226), jnp.int32),), dtype, "t5", 2)

    @jax.jit
    def _t5_fwd(p, ids):
        # one jit program, not an eager 24-block dispatch storm (same
        # hazard class as the CLIP eager forward fixed in pipelines/depth)
        return t5.apply({"params": p}, ids)

    def encode_prompt(prompt, negative):
        def ids_of(text):
            # synthetic-tokenizer stand-in: deterministic ids from the text
            h = abs(hash(text)) % 30000
            return jnp.full((1, 226), 1 + h % 1000, jnp.int32)

        p = resolve(t5_sp)
        pe = _t5_fwd(p, ids_of(prompt or ""))
        ne = _t5_fwd(p, ids_of(negative or ""))
        ne.block_until_ready()
        release(t5_sp)
        return pe.astype(jnp.float32), ne.astype(jnp.float32)

    # --- DepthCrafter stack (SVD UNet + SVD VAE + CLIP-H) ------------------
    unet = UNetSpatioTemporalConditionModel(dtype=dtype, param_dtype=dtype)
    zl = jnp.zeros((1, 2, 16, 16, 8), dtype)
    unet_args = (zl, jnp.zeros((1,), jnp.float32),
                 jnp.zeros((1, 2, 1, 1024), dtype), jnp.zeros((1, 3), jnp.float32))
    unet_sp = staged_synth(unet, unet_args, dtype, "svd_unet", 3)
    svd_vae = AutoencoderKLTemporalDecoder(dtype=dtype, param_dtype=dtype)
    svd_vae_sp = staged_synth(
        svd_vae, (jnp.zeros((1, 1, 32, 32, 3), dtype),), dtype, "svd_vae", 4)
    clip_cfg = clip_vit_h14_config()
    clip = CLIPVisionModelWithProjection(clip_cfg, dtype=dtype, param_dtype=dtype)
    clip_sp = staged_synth(
        clip, (jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3),
                         dtype),), dtype, "clip", 5)
    depth_pipe = DepthCrafterPipeline(
        unet=unet, unet_params=unet_sp, vae=svd_vae, vae_params=svd_vae_sp,
        image_encoder=clip, image_encoder_params=clip_sp, dtype=dtype,
    )

    return ModelBundle(
        pipeline=_TimedPipeline(pipeline),
        depth_infer=_timed("depth", DepthCrafterDemo(depth_pipe).infer),
        encode_prompt=_timed("t5_encode", encode_prompt),
        get_caption=lambda frame: cfg.diffusion.prompt or "a scene",
    )


def synth_input_video(path: str, f=49, h=576, w=1024, fps=10):
    """Deterministic moving-gradient clip (no reference assets needed)."""
    from trajectorycrafter_tpu.utils.video import save_video

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack([
        np.stack([
            0.5 + 0.5 * np.sin(xx / 97.0 + 0.21 * t),
            0.5 + 0.5 * np.cos(yy / 61.0 - 0.13 * t),
            0.5 + 0.5 * np.sin((xx + yy) / 151.0 + 0.08 * t),
        ], axis=-1)
        for t in range(f)
    ])
    save_video(frames, path, fps=fps)
    return path


def make_cfg(small: bool, quant=None, save_dir=None):
    if save_dir is None:
        # separate dirs so a CPU --small smoke can't overwrite (and mask)
        # the artifacts of a concurrently-running full-scale chip run
        save_dir = "/tmp/bench_e2e_out_small" if small else "/tmp/bench_e2e_out"
    from trajectorycrafter_tpu.config import TrajCrafterConfig

    cfg = TrajCrafterConfig()
    # pin explicitly either way: the bench's bf16 legs must stay bf16 even
    # though the config default flipped to int8 (round 5, gate passed)
    cfg.diffusion.quant = quant if quant else "none"
    cfg.video_path = synth_input_video("/tmp/bench_e2e_input.mp4")
    cfg.save_dir = save_dir
    cfg.diffusion.prompt = "a slowly drifting abstract gradient scene"
    cfg.render.camera = "target"
    cfg.render.target_pose = (0.0, 8.0, 0.12, 0.0, 0.0)
    cfg.render.mode = "gradual"
    cfg.offload = "stage"
    if small:
        # CI-sized smoke: dev-scale models, few steps (the full-scale run
        # needs the real chip)
        cfg.allow_dev_stubs = True
        cfg.video_length = 9
        cfg.warp_size = (64, 96)
        cfg.diffusion.sample_size = (32, 48)
        cfg.diffusion.num_inference_steps = 2
        cfg.depth.num_inference_steps = 2
    return cfg


def build_crafter(cfg, small: bool, cls=None):
    from trajectorycrafter_tpu.orchestrator import TrajCrafter

    cls = cls or TrajCrafter
    if small:
        return cls(cfg)
    return cls(cfg, models=build_full_scale_bundle(cfg))


def autoregressive_main(small: bool) -> None:
    """Measured 2-segment autoregressive long-trajectory run (the 2.12 path
    had CPU tests but zero hardware evidence -- VERDICT r4 next-steps #7).

    Per segment: depth re-estimation on the previous gen output, pose
    continuation, warp, full diffusion (reference
    inference_autoregressive.py:216-298 / core_autoregressive.py:26-134).
    Writes bench_autoregressive.json with autoregressive_2seg_s; bench.py
    folds it into the driver artifact."""
    from trajectorycrafter_tpu.autoregressive import TrajCrafterAutoregressive

    cfg = make_cfg(small, save_dir="/tmp/bench_autoreg_out")
    crafter = build_crafter(cfg, small, cls=TrajCrafterAutoregressive)
    t0 = time.time()
    out = crafter.infer_autoregressive(n_splits=2, overlap_frames=4, theta=60.0)
    cold_s = time.time() - t0
    frames_total = int(out.shape[0])

    result = {
        "metric": "autoregressive_2seg",
        "value": round(cold_s, 1),
        "unit": ("s (SMALL dev shapes)" if small else
                 "s (2 segments x 49f, diffusion 384x672, full-scale "
                 "synthetic weights, incl. all compiles, 1 chip)"),
        "vs_baseline": 0.0,
        "autoregressive_2seg_s": round(cold_s, 1),
        "frames_total": frames_total,
        "n_splits": 2,
    }
    if not small:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_autoregressive.json"), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))


def int8_ab(small: bool, psnr_pass_db: float) -> dict:
    """Same-seed bf16-vs-int8 A/B: run the orchestrator twice, compare the
    two gen.mp4s with utils/quality, return the flip-on decision artifact
    (the round-3 verdict's automated int8 quality gate)."""
    from trajectorycrafter_tpu.utils.quality import gate_metrics, video_quality
    from trajectorycrafter_tpu.utils.video import f01_to_u8, read_video_frames

    paths = {}
    for quant in (None, "int8"):
        tag = quant or "bf16"
        cfg = make_cfg(small, quant=quant, save_dir=f"/tmp/bench_e2e_ab_{tag}")
        build_crafter(cfg, small).infer_gradual()
        paths[tag] = os.path.join(cfg.save_dir, "gen.mp4")
    a = read_video_frames(paths["bf16"], -1, width=None, height=None)
    b = read_video_frames(paths["int8"], -1, width=None, height=None)
    m = gate_metrics(video_quality(f01_to_u8(a), f01_to_u8(b)), psnr_pass_db)
    m["weights"] = ("dev-scale synthetic" if small
                    else "full-scale synthetic (real weights unreachable)")
    return m


def main():
    from trajectorycrafter_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    small = "--small" in sys.argv or jax.devices()[0].platform == "cpu"

    if "--autoregressive" in sys.argv:
        return autoregressive_main(small)

    if "--ab" in sys.argv:
        # one command -> the int8 flip-on/flip-off decision artifact
        bar = 35.0
        if "--psnr_pass_db" in sys.argv:
            bar = float(sys.argv[sys.argv.index("--psnr_pass_db") + 1])
        result = {"metric": "int8_ab_quality", "unit": "dB/ssim",
                  **int8_ab(small, bar)}
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_int8_ab.json"), "w") as f:
            json.dump(result, f)
        print(json.dumps(result))
        if not result["pass"]:
            raise SystemExit(1)
        return

    cfg = make_cfg(small, quant="int8" if "--int8" in sys.argv else None)
    crafter = build_crafter(cfg, small)

    t0 = time.time()
    crafter.infer_gradual()
    cold_s = time.time() - t0
    print(f"# cold run (incl. all compiles): {cold_s:.1f}s", file=sys.stderr)

    # warm run: compiles cached; still pays the per-video stage offload
    # reloads (here: on-device re-synthesis standing in for the host push)
    STAGE_T.clear()
    t0 = time.time()
    crafter.infer_gradual()
    e2e_s = time.time() - t0
    breakdown = {k: round(v, 1) for k, v in sorted(STAGE_T.items())}
    synth_total = sum(v for k, v in STAGE_T.items() if k.startswith("synth_"))
    top_level = (STAGE_T.get("depth", 0.0) + STAGE_T.get("t5_encode", 0.0)
                 + STAGE_T.get("diffusion", 0.0))
    breakdown["other_host_warp_io"] = round(e2e_s - top_level, 1)
    breakdown["note"] = (
        "synth_* times are NESTED inside their stage (synth_dit/synth_vae "
        "in diffusion, synth_svd_*/synth_clip in depth, synth_t5 in "
        "t5_encode): the per-video on-device regeneration of the offloaded "
        f"synthetic params ({synth_total:.0f}s total) stands in for the "
        "host->device push of converted weights in production (PCIe-fast "
        "on real hardware, minutes of small dispatches through this relay)")
    print(f"# warm breakdown: {json.dumps(breakdown)}", file=sys.stderr)

    result = {
        "metric": "e2e_sec_per_video",
        "unit": ("s (SMALL dev shapes -- not production)" if small else
                 "s (49f, diffusion 384x672, warp/depth 576x1024, full-scale "
                 "synthetic weights, stage offload, 1 chip)"),
        "value": round(e2e_s, 1),
        "vs_baseline": 0.0 if small else round(290.0 / e2e_s, 3),
        "caption_stage": "fixed_prompt",
        "offload": cfg.offload,
        "quant": cfg.diffusion.quant,
        "cold_first_video_s": round(cold_s, 1),
        "stage_breakdown_warm_s": breakdown,
    }
    if not small:
        result["e2e_sec_per_video_384x672_orchestrated"] = round(e2e_s, 1)
        out = ("bench_e2e_int8.json" if cfg.diffusion.quant == "int8"
               else "bench_e2e.json")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               out), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
