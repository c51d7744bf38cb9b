"""Non-denoise stage benchmark: measure the pipeline stages the headline
bench attributes by ratio (bench.py est_sec_per_video = 50*step/0.8).

Measures at the production 49f@384x672 configuration with synthetic weights
(same shapes as the real checkpoints, so identical compute):

  * VAE decode of the final (1, 13, 48, 84, 16) latents;
  * VAE encode of the conditioning videos (masked video + 10 ref frames),
    run once per sample (pipeline_trajectorycrafter.py:874-1028 analog);
  * one DepthCrafter UNet denoise step at 49f x 576x1024 (depth runs at
    max_res 1024, 5 steps, no CFG -- models/infer.py:52-92 analog);
  * the forward-splat warp of 49 frames at 576x1024.

Prints ONE JSON line with per-stage seconds and a measured whole-video
estimate: 50 denoise steps (from bench.py's measured step, passed via
--step_s) + encodes + decode + 5 depth steps + warp + fixed host I/O slack.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def synth(model, args, dtype, seed=0):
    """One jit'd init on (tiny) example args -- conv/dense param shapes are
    input-size independent, and a single compile avoids one remote-compile
    round trip per unique leaf shape (minutes through the axon helper)."""
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), *args)["params"]
    return jax.tree.map(lambda a: a.astype(dtype), params)


def timeit(fn, *args, iters=2):
    """Axon-relay-safe timing: one jit program whose output is a scalar
    reduction of the stage result, fetched to host each iteration
    (block_until_ready can return early through the relay; a value fetch
    cannot)."""

    @jax.jit
    def forced(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(forced(*args))  # warm compile
    t0 = time.time()
    for _ in range(iters):
        float(forced(*args))
    return (time.time() - t0) / iters


def main():
    from trajectorycrafter_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    small = "--small" in sys.argv or jax.devices()[0].platform == "cpu"
    step_s = step576_s = None
    for a in sys.argv[1:]:
        if a.startswith("--step_s="):
            step_s = float(a.split("=")[1])
        if a.startswith("--step576_s="):
            step576_s = float(a.split("=")[1])
    dtype = jnp.bfloat16
    unit = ("s (TINY dev shapes -- not production numbers)" if small
            else "s (49f@384x672 unless noted)")
    result = {"metric": "stage_latency", "unit": unit}

    # --- 3D VAE ------------------------------------------------------------
    from trajectorycrafter_tpu.models.vae import (
        AutoencoderKLCogVideoX,
        vae_decode,
        vae_decode_tiled,
        vae_encode,
    )

    if small:
        f_pix, hh, ww = 5, 64, 96
        ref_pix = 2
    else:
        f_pix, hh, ww = 49, 384, 672
        ref_pix = 10
    vae = AutoencoderKLCogVideoX(dtype=dtype, param_dtype=dtype)
    ex = jnp.zeros((1, 1, 8, 8, 3), dtype)
    vparams = synth(vae, (ex,), dtype)

    from trajectorycrafter_tpu.models.vae import vae_decode_auto

    lat = jnp.zeros((1, (f_pix - 1) // 4 + 1, hh // 8, ww // 8, 16), dtype)
    print("# measuring vae_decode...", file=sys.stderr, flush=True)
    # vae_decode_auto is the production path: at 49f@384x672 it strips the
    # decode (the one-shot program peaks ~11 GB and only fits an otherwise
    # empty chip -- the pipeline decodes right after the denoise stage).
    # NOT under timeit's outer jit: tracing the whole strip loop into one
    # program fuses every strip plus the blend and the compile-time temp
    # analysis overflows HBM; production dispatches strips one by one.
    def time_decode(fn, z, iters=2):
        # warm with a VALUE FETCH, not block_until_ready: through the axon
        # relay block_until_ready can return before remote compiles finish,
        # and the first timed iteration then absorbs minutes of compile
        # (this exact artifact produced a bogus 106.9s tiled-decode reading
        # on 2026-08-21; steady-state is ~3.2s)
        np.asarray(fn(vparams, z)[0, 0, 0, :3])
        t0 = time.time()
        for _ in range(iters):
            out = fn(vparams, z)
            np.asarray(out[0, 0, 0, :3])  # value fetch (relay-safe)
        return (time.time() - t0) / iters

    dec_auto = lambda p, z: vae_decode_auto(vae, p, z)
    result["vae_decode_s"] = round(time_decode(dec_auto, lat), 3)

    vid = jnp.zeros((1, f_pix, hh, ww, 3), dtype)
    refv = jnp.zeros((1, ref_pix, hh, ww, 3), dtype)
    enc = lambda p, x: vae_encode(vae, p, x)
    print("# measuring vae_encode...", file=sys.stderr, flush=True)
    result["vae_encode_masked_s"] = round(timeit(enc, vparams, vid), 3)
    result["vae_encode_ref_s"] = round(timeit(enc, vparams, refv), 3)

    if not small:
        # --- VAE at the headline 49f@576x1024 resolution (the north-star
        # metric names this config; previously only 384x672 was measured)
        lat576 = jnp.zeros((1, 13, 72, 128, 16), dtype)
        print("# measuring vae_decode 576x1024...", file=sys.stderr, flush=True)
        # full-frame decode at 49f@576x1024 needs >16 GB HBM (measured OOM:
        # ten 1.28 GB up_blocks_3 activations live at once) -- use the
        # auto-tiled decode the production pipeline uses (full-width strips,
        # reference tiled_decode analog, autoencoder_magvit.py:1302-1392)
        from trajectorycrafter_tpu.models.vae import vae_decode_auto

        dec576 = lambda p, z: vae_decode_auto(vae, p, z)
        result["vae_decode_576x1024_s"] = round(
            time_decode(dec576, lat576), 3)
        vid576 = jnp.zeros((1, 49, 576, 1024, 3), dtype)
        ref576 = jnp.zeros((1, 10, 576, 1024, 3), dtype)
        print("# measuring vae_encode 576x1024...", file=sys.stderr, flush=True)
        result["vae_encode_masked_576x1024_s"] = round(
            timeit(enc, vparams, vid576), 3)
        result["vae_encode_ref_576x1024_s"] = round(
            timeit(enc, vparams, ref576), 3)

    # --- DepthCrafter UNet step at 576x1024 --------------------------------
    from trajectorycrafter_tpu.models.depthcrafter import (
        UNetSpatioTemporalConditionModel,
    )

    if small:
        df, dh, dw = 3, 64, 128  # latent 8x16 stays divisible through 3 downs
        unet = UNetSpatioTemporalConditionModel(
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            num_attention_heads=(2, 4, 4, 8), dtype=dtype, param_dtype=dtype)
    else:
        df, dh, dw = 49, 576, 1024
        unet = UNetSpatioTemporalConditionModel(dtype=dtype, param_dtype=dtype)
    zl = jnp.zeros((1, df, dh // 8, dw // 8, 8), dtype)
    t = jnp.zeros((1,), jnp.float32)
    clip_emb = jnp.zeros((1, df, 1, 1024), dtype)
    added = jnp.zeros((1, 3), jnp.float32)
    # init at a tiny spatial grid (param shapes are input-size independent)
    zl_init = jnp.zeros((1, 2, 16, 16, 8), dtype)
    clip_init = jnp.zeros((1, 2, 1, 1024), dtype)
    uparams = synth(unet, (zl_init, t, clip_init, added), dtype)
    ustep = jax.jit(lambda p, z: unet.apply({"params": p}, z, t, clip_emb, added))
    print("# measuring depth_unet...", file=sys.stderr, flush=True)
    result["depth_unet_step_s"] = round(timeit(ustep, uparams, zl), 3)
    result["depth_attn_kernel"] = os.environ.get(
        "TRAJCRAFTER_DEPTH_ATTN", "flash_stock")
    result["depth_total_s"] = round(result["depth_unet_step_s"] * 5, 3)

    # A/B the round-5 two-pass TRUE-max exp2 kernel so its status stays a
    # measured decision (VERDICT r4 next-steps #5: measured on chip
    # 2026-08-21 at 2.006 vs 1.945 s/step stock -> REFUTED, stock stays the
    # default).  Env var is read at trace time; the fresh jit closure
    # forces a retrace.
    if not small:
        os.environ["TRAJCRAFTER_DEPTH_ATTN"] = "flash_max"
        try:
            ustep_max = jax.jit(
                lambda p, z: unet.apply({"params": p}, z, t, clip_emb, added))
            print("# measuring depth_unet flash_max...", file=sys.stderr,
                  flush=True)
            result["depth_unet_step_maxpass_s"] = round(
                timeit(ustep_max, uparams, zl), 3)
        except Exception as e:
            result["depth_unet_step_maxpass_s"] = f"failed: {str(e)[:60]}"
        finally:
            os.environ.pop("TRAJCRAFTER_DEPTH_ATTN", None)

    # int8 variant: transformer GEMMs (~39% of the UNet's FLOPs analytically)
    # on the int8 MXU via quantize_depth_unet_params; measured either way so
    # the flip-on decision is evidence-backed (docs/COVERAGE.md).
    if not small:
        from trajectorycrafter_tpu.ops.int8 import quantize_depth_unet_params

        qunet = UNetSpatioTemporalConditionModel(
            dtype=dtype, param_dtype=dtype, quant="int8")
        print("# quantizing depth_unet...", file=sys.stderr, flush=True)
        quparams = jax.device_put(quantize_depth_unet_params(
            jax.tree.map(lambda a: np.asarray(a), uparams)))
        qstep = jax.jit(
            lambda p, z: qunet.apply({"params": p}, z, t, clip_emb, added))
        print("# measuring depth_unet int8...", file=sys.stderr, flush=True)
        result["depth_unet_step_int8_s"] = round(timeit(qstep, quparams, zl), 3)
        del quparams

    # --- forward-splat warp at 576x1024 ------------------------------------
    from trajectorycrafter_tpu.ops.splat import forward_warp_batch

    wf = 5 if small else 49
    whh, www = (64, 96) if small else (576, 1024)
    frames = jnp.zeros((wf, whh, www, 3))
    depths = jnp.ones((wf, whh, www))
    pose = jnp.tile(jnp.eye(4)[None], (wf, 1, 1))
    K = jnp.tile(jnp.asarray([[500.0, 0, www / 2], [0, 500.0, whh / 2],
                              [0, 0, 1]])[None], (wf, 1, 1))
    warp = jax.jit(lambda fr, d: forward_warp_batch(fr, d, pose, pose, K))
    print("# measuring warp...", file=sys.stderr, flush=True)
    result["warp_49f_s"] = round(timeit(warp, frames, depths), 3)

    non_denoise = (result["vae_decode_s"] + result["vae_encode_masked_s"]
                   + result["vae_encode_ref_s"] + result["depth_total_s"]
                   + result["warp_49f_s"] + 5.0)  # + host I/O / caption slack
    if step_s is not None and not small:
        total = 50.0 * step_s + non_denoise
        result["measured_sec_per_video_384x672"] = round(total, 1)
        result["value"] = result["measured_sec_per_video_384x672"]
        result["vs_baseline"] = round(290.0 / total, 3)
    else:
        # tiny/CPU shapes: per-stage numbers only, no production aggregate
        result["value"] = result["vae_decode_s"]
        result["vs_baseline"] = 0.0
    if not small:
        # headline-resolution aggregate (depth + warp already run at
        # 576x1024; swap in the 576x1024 VAE legs)
        non_denoise_576 = (result["vae_decode_576x1024_s"]
                           + result["vae_encode_masked_576x1024_s"]
                           + result["vae_encode_ref_576x1024_s"]
                           + result["depth_total_s"]
                           + result["warp_49f_s"] + 5.0)
        result["non_denoise_576x1024_s"] = round(non_denoise_576, 1)
        if step576_s is not None:
            result["measured_sec_per_video_576x1024"] = round(
                50.0 * step576_s + non_denoise_576, 1)
        # persist for bench.py's video estimate (keeps the aggregate in sync
        # with the latest stage measurements instead of a baked-in constant)
        result["non_denoise_s"] = round(non_denoise, 1)
        # empty-chip ONE-SHOT 384x672 decode as a secondary metric (tiled
        # overhead = vae_decode_s - this).  LAST on purpose: a mid-run
        # RESOURCE_EXHAUSTED poisons the backend for the whole process, so
        # nothing may run after a failed attempt.
        print("# measuring vae_decode one-shot...", file=sys.stderr, flush=True)
        try:
            result["vae_decode_oneshot_s"] = round(
                timeit(lambda p, z: vae_decode(vae, p, z), vparams, lat), 3)
        except Exception as e:
            result["vae_decode_oneshot_s"] = f"failed: {str(e)[:60]}"
        with open("bench_stages.json", "w") as f:
            json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
