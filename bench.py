"""Single-chip denoise benchmark at the reference's headline configuration.

Measures one CFG denoise step -- the dominant cost of the pipeline
(SURVEY.md section 3.1 'HOT LOOP #2'): a CFG-doubled forward of the deployed
DiT scale (42 blocks, dim 3072, 48x64 heads, Perceiver cross-attention every
2 blocks) at 49 frames x 576x1024 -> 13x36x64 = 29,952 video tokens + 226
text tokens, bf16, Pallas flash attention -- plus the DDIM update.

Baseline anchor: the reference publishes no perf tables (BASELINE.md); the
only end-to-end number is the 290 s/video HF-Spaces A100 budget
(gradio_app.py:97), which corresponds to the reference's default 384x672
denoise resolution (13,330 tokens).  Attributing 80% of the budget to the
50-step loop gives ~4.64 s/step at 384x672; scaling by the FLOPs ratio to
this benchmark's 576x1024 resolution (30,178 tokens; attention is quadratic)
gives ~16.0 s/step as the A100-equivalent baseline -- consistent with A100
bf16 peak (4.64 s/step at 576x1024 would exceed it).
vs_baseline = 16.0 / measured.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# 290 s * 0.8 / 50 steps at 384x672, scaled by the 576x1024 FLOPs ratio (3.45x)
BASELINE_STEP_S = (290.0 * 0.8 / 50.0) * 3.45  # ~16.0 s/step A100-equivalent

# --- v5e roofline + slice-model constants (assumptions, stated in the JSON) --
PEAK_BF16_TFLOPS = 197.0  # TPU v5e bf16 peak per chip
PEAK_INT8_TFLOPS = 394.0  # TPU v5e int8 peak per chip
ICI_BYTES_PER_S = 4.5e10  # v5e per-link unidirectional ICI bandwidth


def dit_step_flops(sv: int, st: int, sref: int, d: int = 3072,
                   layers: int = 42, cfg_batch: int = 2) -> float:
    """FLOPs of ONE CFG denoise step of the deployed DiT.

    Per block (joint text+video self-attention over s = sv + st tokens):
    qkv+out projections 8*s*d^2, scores+PV 4*s^2*d, FF (4x expansion,
    in+out) 16*s*d^2.  Perceiver cross-attention every 2 blocks: q+out
    4*sv*d^2, kv 4*sref*d^2, scores+PV 4*sv*sref*d
    (models/dit.py; reference crosstransformer3d.py:140-420).  Patch embed /
    AdaLN / final proj are O(s*d) noise and ignored (<1%).
    """
    s = sv + st
    per_block = 24.0 * s * d * d + 4.0 * s * s * d
    cross = (layers // 2) * (4.0 * sv * d * d + 4.0 * sref * d * d
                             + 4.0 * sv * sref * d)
    return cfg_batch * (layers * per_block + cross)


def project_8chip_stages(step_s: float, stages: dict, step_flops: float,
                         res: str, n: int = 8, dp: int = 2, sp: int = 4,
                         d: int = 3072, layers: int = 42,
                         sv: int = 13104, st: int = 226) -> dict:
    """Per-stage 8-chip projection from single-chip stage measurements.

    Named formulas instead of a flat /8/0.85 (VERDICT r4 weak #2):

    - denoise: dp shards the CFG pair, sp shards the joint sequence ->
      compute/8, plus an un-overlapped ring-attention term: each of the 42
      blocks circulates its KV shard (sp-1) hops of
      2 * (s/sp) * d * 2 bytes over ICI, plus one 3.3 MB CFG-combine
      all-reduce per step (negligible, included).
    - depth: 49 frames < the 110-frame window -> one window; the UNet shards
      spatially over all 8 chips with conv-halo exchanges, modeled as a 0.9
      efficiency on linear scaling (halo rows are <2% of a 72x128 latent but
      batch-norm-free group ops add small collectives).
    - VAE encode/decode: temporal scan stays serial, spatial tiles shard
      over 8 chips with overlap-blend halos -> same 0.9 halo efficiency.
    - warp: 49 independent frames over 8 chips -> ceil(49/8)=7 per chip,
      i.e. linear scaling x 49/56 load-balance efficiency.
    - host mp4/O slack: NOT divided (single-host work).

    Shardings themselves are validated (execute + bit-match) on the virtual
    8-device mesh by dryrun_multichip; this composes their measured
    single-chip costs, it is not a multi-chip measurement.
    """
    s_tok = sv + st
    kv_bytes_per_hop = 2.0 * (s_tok / sp) * d * 2.0  # K+V, bf16
    ring_s = layers * (sp - 1) * kv_bytes_per_hop / ICI_BYTES_PER_S
    latents_bytes = sv * 4 * 16 * 4.0  # f*h*w patches x p^2 x 16ch, fp32
    cfg_allreduce_s = 2.0 * latents_bytes / ICI_BYTES_PER_S
    denoise8 = 50.0 * (step_s / n + ring_s + cfg_allreduce_s)

    halo_eff = 0.9
    depth8 = stages["depth_total_s"] / n / halo_eff
    suffix = "_576x1024_s" if res == "576x1024" else "_s"
    vae8 = (stages["vae_decode" + suffix] + stages["vae_encode_masked" + suffix]
            + stages["vae_encode_ref" + suffix]) / n / halo_eff
    warp8 = stages["warp_49f_s"] / n * (56.0 / 49.0)
    host_s = 5.0  # bench_stages' fixed host I/O slack, single-host

    total = denoise8 + depth8 + vae8 + warp8 + host_s
    return {
        "mesh": f"dp{dp} x sp{sp} ({n} chips)",
        "denoise_50step_s": round(denoise8, 2),
        "ring_comm_per_step_s": round(ring_s, 4),
        "cfg_allreduce_per_step_s": round(cfg_allreduce_s, 5),
        "depth_s": round(depth8, 2),
        "vae_s": round(vae8, 2),
        "warp_s": round(warp8, 2),
        "host_s": host_s,
        "total_s": round(total, 1),
        "assumptions": (
            f"ICI {ICI_BYTES_PER_S/1e9:.0f} GB/s/link un-overlapped ring KV; "
            "0.9 halo efficiency on spatially-sharded depth/VAE; warp "
            "49/56 load balance; host mp4 work not divided"),
    }


def synth_params(model, example_args, key, dtype):
    """Random params straight on device without compiling the forward.

    Leaves keep their init dtype where it isn't the model compute dtype
    (e.g. Int8Dense kernel_q int8 / scale f32), so the int8 bench builds its
    quantized tree directly without ever materialising the bf16 twin
    (6.1B params -> the pair would blow HBM).
    """
    shapes = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a), *example_args
    )["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    def make(k, s):
        if s.dtype == jnp.int8:
            return jax.random.randint(k, s.shape, -127, 128, jnp.int32).astype(jnp.int8)
        if s.dtype in (jnp.float32, jnp.float64) and dtype != jnp.float32:
            # quantization scales and other fp32 side-cars
            return jnp.full(s.shape, 2e-4, jnp.float32)
        return (jax.random.normal(k, s.shape, jnp.float32) * 0.02).astype(dtype)

    # ONE jit program for the whole tree: per-leaf dispatch was ~700 remote
    # round trips through the axon relay (measured 13-83 s per stage
    # resynthesis, dominating the orchestrated-bench variance); a single
    # program materializes the same tree in one execution
    @jax.jit
    def make_all(k):
        ks = jax.random.split(k, len(leaves))
        return [make(ki, s) for ki, s in zip(ks, leaves)]

    return jax.tree_util.tree_unflatten(treedef, make_all(key))


def virtual_mesh_main(n_devices: int = 8):
    """Sharded == unsharded denoise-step check on a virtual CPU mesh, with
    per-layout wall-clock (correctness of the --mesh_dp/sp/tp inference path;
    VERDICT round-1 item 2).  Bootstraps host devices in a subprocess when the
    node exposes fewer than n_devices (same recipe as __graft_entry__)."""
    import os
    import subprocess

    if len(jax.devices()) < n_devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            t for t in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in t
        )
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import bench; bench.virtual_mesh_main()\n"
        )
        raise SystemExit(subprocess.run(
            [sys.executable, "-c", code], env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).returncode)

    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.parallel import dit_param_sharding, make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    # ring attention shards the joint [text; video] sequence, so pick sizes
    # with (text_len + video_tokens) divisible by every sp used below:
    # 16 + 5*8*12 = 496 = 8 * 62
    heads, head_dim, layers, text_len = 4, 32, 4, 16
    f, h, w = 5, 16, 24
    dtype = jnp.float32

    def build(shard, impl):
        return CrossTransformer3DModel(
            num_attention_heads=heads, attention_head_dim=head_dim,
            num_layers=layers, max_text_seq_length=text_len,
            in_channels=33, out_channels=16,
            time_embed_dim=64, text_embed_dim=128,
            use_rotary_positional_embeddings=True, attention_impl=impl,
            shard_activations=shard, dtype=dtype, param_dtype=dtype,
        )

    model = build(False, "xla")
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, f, h, w, 16), dtype)
    text = jax.random.normal(jax.random.PRNGKey(2), (2, text_len, 128), dtype)
    tvec = jnp.full((2,), 311.0)
    inpaint = jax.random.normal(jax.random.PRNGKey(3), (2, f, h, w, 17), dtype)
    cross = jax.random.normal(jax.random.PRNGKey(4), (2, 1, h, w, 16), dtype)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), hidden, text, tvec, inpaint, cross
    )["params"]
    args = (hidden, text, tvec, inpaint, cross)

    def timed(fn, p, a):
        out = jax.block_until_ready(fn(p, *a))
        t0 = time.time()
        for _ in range(3):
            out = jax.block_until_ready(fn(p, *a))
        return np.asarray(out), (time.time() - t0) / 3

    want, t_single = timed(
        jax.jit(lambda p, *a: model.apply({"params": p}, *a)), params, args
    )

    layouts = {"dp2_sp2_tp2": (2, 2, 2), "sp8": (1, 8, 1), "tp4_dp2": (2, 1, 4)}
    result = {"metric": "virtual_mesh_parity", "unit": "s/step (virtual CPU mesh)",
              "n_devices": n_devices, "single_device_s": round(t_single, 4),
              "value": 1, "vs_baseline": 1.0}
    for name, (dp, sp, tp) in layouts.items():
        mesh = make_mesh(dp=dp, sp=sp, tp=tp)
        m = build(True, "ring" if sp > 1 else "xla")
        p_s = jax.device_put(params, dit_param_sharding(params, mesh))
        a_s = [jax.device_put(
            x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))) for x in args]
        with jax.set_mesh(mesh):
            got, t = timed(
                jax.jit(lambda p, *a: m.apply({"params": p}, *a)), p_s, a_s
            )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
        result[f"{name}_s"] = round(t, 4)
        print(f"# {name}: {t:.4f}s (single {t_single:.4f}s) parity OK",
              file=sys.stderr)
    print(json.dumps(result))


def main():
    from trajectorycrafter_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if "--virtual_mesh" in sys.argv:
        return virtual_mesh_main()
    small = "--small" in sys.argv or jax.devices()[0].platform == "cpu"

    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.ops.rope import rope_for_sample
    from trajectorycrafter_tpu.schedulers import DDIMScheduler

    if small:
        layers, heads, head_dim, text_len = 2, 4, 64, 16
        f, h, w = 3, 16, 24  # latent grid (pixels = x8)
        ref_f = 1
    else:
        layers, heads, head_dim, text_len = 42, 48, 64, 226
        f, h, w = 13, 72, 128  # 49f x 576x1024 -> latents 13 x 72 x 128
        ref_f = 3  # 10 reference frames -> 3 latent frames

    dtype = jnp.bfloat16
    use_int8 = "--int8" in sys.argv  # block attn/FF GEMMs on the int8 MXU
    model = CrossTransformer3DModel(
        num_attention_heads=heads,
        attention_head_dim=head_dim,
        num_layers=layers,
        max_text_seq_length=text_len,
        use_rotary_positional_embeddings=True,
        attention_impl="flash" if not small else "xla",
        quant="int8" if use_int8 else "none",
        dtype=dtype,
        param_dtype=dtype,
    )
    b = 2  # CFG pair
    hidden = jnp.zeros((1, f, h, w, 16), dtype)
    text = jnp.zeros((1, text_len, 4096), dtype)
    tvec = jnp.zeros((1,))
    inpaint = jnp.zeros((1, f, h, w, 17), dtype)
    cross = jnp.zeros((1, ref_f, h, w, 16), dtype)
    params = synth_params(model, (hidden, text, tvec, inpaint, cross),
                          jax.random.PRNGKey(0), dtype)
    nparams = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    print(f"# params: {nparams/1e9:.2f}B, dtype {dtype.__name__}", file=sys.stderr)

    cos, sin = rope_for_sample(head_dim, h * 8, w * 8, f)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    scheduler = DDIMScheduler(prediction_type="v_prediction")
    state = scheduler.set_timesteps(50)
    guidance = 6.0

    @jax.jit
    def denoise_step(params, latents, text2, inpaint2, cross2, i):
        lat_in = jnp.concatenate([latents] * 2, axis=0)
        t = state.timesteps[i]
        tb = jnp.broadcast_to(t, (b,)).astype(jnp.float32)
        pred = model.apply(
            {"params": params}, lat_in.astype(dtype), text2, tb,
            inpaint_latents=inpaint2, cross_latents=cross2, image_rotary_emb=rope,
        ).astype(jnp.float32)
        uncond, cond = jnp.split(pred, 2, axis=0)
        pred = uncond + guidance * (cond - uncond)
        return scheduler.step(state, pred, i, latents)

    latents = jax.random.normal(jax.random.PRNGKey(1), (1, f, h, w, 16), jnp.float32)
    text2 = jnp.concatenate([text] * 2)
    inpaint2 = jnp.concatenate([inpaint] * 2)
    cross2 = jnp.concatenate([cross] * 2)

    t0 = time.time()
    latents = denoise_step(params, latents, text2, inpaint2, cross2, 0)
    latents.block_until_ready()
    compile_s = time.time() - t0
    print(f"# compile+first step: {compile_s:.1f}s", file=sys.stderr)

    iters = 3 if not small else 2
    t0 = time.time()
    for i in range(1, iters + 1):
        latents = denoise_step(params, latents, text2, inpaint2, cross2, i)
    latents.block_until_ready()
    step_s = (time.time() - t0) / iters

    # secondary: the reference's own denoise resolution (384x672 -> 13,330
    # tokens), directly comparable to the 290 s/video A100 anchor
    step384_s = None
    if not small:
        f2, h2, w2 = 13, 48, 84
        cos2, sin2 = rope_for_sample(head_dim, h2 * 8, w2 * 8, f2)
        rope2 = (jnp.asarray(cos2), jnp.asarray(sin2))

        @jax.jit
        def denoise_step_384(params, latents, text2, inpaint2, cross2, i):
            lat_in = jnp.concatenate([latents] * 2, axis=0)
            tb = jnp.broadcast_to(state.timesteps[i], (b,)).astype(jnp.float32)
            pred = model.apply(
                {"params": params}, lat_in.astype(dtype), text2, tb,
                inpaint_latents=inpaint2, cross_latents=cross2,
                image_rotary_emb=rope2,
            ).astype(jnp.float32)
            uncond, cond = jnp.split(pred, 2, axis=0)
            return scheduler.step(state, uncond + guidance * (cond - uncond), i, latents)

        lat384 = jax.random.normal(jax.random.PRNGKey(2), (1, f2, h2, w2, 16),
                                   jnp.float32)
        inp384 = jnp.zeros((2, f2, h2, w2, 17), dtype)
        cr384 = jnp.zeros((2, ref_f, h2, w2, 16), dtype)
        lat384 = denoise_step_384(params, lat384, text2, inp384, cr384, 0)
        lat384.block_until_ready()
        t0 = time.time()
        for i in range(1, iters + 1):
            lat384 = denoise_step_384(params, lat384, text2, inp384, cr384, i)
        lat384.block_until_ready()
        step384_s = (time.time() - t0) / iters

    # --- opt-in int8 GEMM variant, reported alongside the bf16 headline ----
    # (quant="int8" stays off by default in inference -- output-quality
    # parity needs real checkpoints, docs/COVERAGE.md -- but the measured
    # speedup belongs in the driver artifact).  The bf16 tree (12.2 GB)
    # must be freed before the int8 tree is synthesised: both together
    # exceed the 16 GB HBM.
    int8_step_s = None
    int8_step384_s = None
    if not small and not use_int8 and "--no_int8" not in sys.argv:
        del params
        getattr(denoise_step, "clear_cache", lambda: None)()
        model8 = model.clone(quant="int8")
        params8 = synth_params(model8, (hidden, text, tvec, inpaint, cross),
                               jax.random.PRNGKey(0), dtype)

        @jax.jit
        def denoise_step8(params, latents, text2, inpaint2, cross2, i):
            lat_in = jnp.concatenate([latents] * 2, axis=0)
            tb = jnp.broadcast_to(state.timesteps[i], (b,)).astype(jnp.float32)
            pred = model8.apply(
                {"params": params}, lat_in.astype(dtype), text2, tb,
                inpaint_latents=inpaint2, cross_latents=cross2,
                image_rotary_emb=rope,
            ).astype(jnp.float32)
            uncond, cond = jnp.split(pred, 2, axis=0)
            return scheduler.step(state, uncond + guidance * (cond - uncond), i, latents)

        # best-effort: never let the int8 legs (incl. the Pallas GEMM
        # compile) sink the bf16 headline artifact.  If the auto-routed
        # Pallas kernels fail to compile, retry once pinned to the XLA
        # int8 lowering (TRAJCRAFTER_INT8_IMPL=xla, read at trace time).
        def run_576():
            lat8 = jax.random.normal(jax.random.PRNGKey(3), (1, f, h, w, 16),
                                     jnp.float32)
            lat8 = denoise_step8(params8, lat8, text2, inpaint2, cross2, 0)
            lat8.block_until_ready()
            t0 = time.time()
            for i in range(1, iters + 1):
                lat8 = denoise_step8(params8, lat8, text2, inpaint2, cross2, i)
            lat8.block_until_ready()
            return (time.time() - t0) / iters

        try:
            try:
                int8_step_s = run_576()
            except Exception as e:
                print(f"# int8 pallas path failed ({e}); retrying with "
                      "TRAJCRAFTER_INT8_IMPL=xla", file=sys.stderr)
                os.environ["TRAJCRAFTER_INT8_IMPL"] = "xla"
                denoise_step8.clear_cache()
                int8_step_s = run_576()
            print(f"# int8 step: {int8_step_s:.3f}s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# int8 576x1024 leg skipped: {e}", file=sys.stderr)

        # int8 at the reference's 384x672 resolution (the video-anchor
        # config); best-effort -- never let it sink the headline artifact
        try:
            f2, h2, w2 = 13, 48, 84
            cos2, sin2 = rope_for_sample(head_dim, h2 * 8, w2 * 8, f2)
            rope2 = (jnp.asarray(cos2), jnp.asarray(sin2))

            @jax.jit
            def denoise_step8_384(params, latents, text2, inpaint2, cross2, i):
                lat_in = jnp.concatenate([latents] * 2, axis=0)
                tb = jnp.broadcast_to(state.timesteps[i], (b,)).astype(jnp.float32)
                pred = model8.apply(
                    {"params": params}, lat_in.astype(dtype), text2, tb,
                    inpaint_latents=inpaint2, cross_latents=cross2,
                    image_rotary_emb=rope2,
                ).astype(jnp.float32)
                uncond, cond = jnp.split(pred, 2, axis=0)
                return scheduler.step(state, uncond + guidance * (cond - uncond),
                                      i, latents)

            def run_384():
                lat8b = jax.random.normal(jax.random.PRNGKey(4),
                                          (1, f2, h2, w2, 16), jnp.float32)
                inp384b = jnp.zeros((2, f2, h2, w2, 17), dtype)
                cr384b = jnp.zeros((2, ref_f, h2, w2, 16), dtype)
                lat8b = denoise_step8_384(params8, lat8b, text2, inp384b,
                                          cr384b, 0)
                lat8b.block_until_ready()
                t0 = time.time()
                for i in range(1, iters + 1):
                    lat8b = denoise_step8_384(params8, lat8b, text2, inp384b,
                                              cr384b, i)
                lat8b.block_until_ready()
                return (time.time() - t0) / iters

            try:
                int8_step384_s = run_384()
            except Exception as e:
                print(f"# int8 384x672 pallas path failed ({e}); retrying "
                      "with TRAJCRAFTER_INT8_IMPL=xla", file=sys.stderr)
                os.environ["TRAJCRAFTER_INT8_IMPL"] = "xla"
                denoise_step8_384.clear_cache()
                int8_step384_s = run_384()
            print(f"# int8 step 384x672: {int8_step384_s:.3f}s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# int8 384x672 leg skipped: {e}", file=sys.stderr)

    frames_per_s = 49.0 / (step_s * 50.0)
    # roofline: analytic FLOP count of one CFG step (dit_step_flops docstring)
    sv576, sv384, st_tok = 13 * 36 * 64, 13 * 24 * 42, text_len
    flops576 = dit_step_flops(sv576, st_tok, ref_f * 36 * 64) if not small else 0
    flops384 = dit_step_flops(sv384, st_tok, ref_f * 24 * 42) if not small else 0
    result = {
        "metric": "denoise_step_latency",
        "value": round(step_s, 4),
        "unit": "s/step (CFG pair, 49f@576x1024, 42-block DiT, 1 chip)",
        "vs_baseline": round(BASELINE_STEP_S / step_s, 3),
        "frames_per_sec_per_chip": round(frames_per_s, 4),
        "params_b": round(nparams / 1e9, 3),
        "compile_s": round(compile_s, 1),
    }
    if not small:
        result["step_tflops"] = round(flops576 / 1e12, 1)
        result["achieved_tf_s"] = round(flops576 / step_s / 1e12, 1)
        result["mfu_pct"] = round(100.0 * flops576 / step_s / 1e12
                                  / PEAK_BF16_TFLOPS, 1)
    if int8_step_s is not None:
        result["int8_step_s"] = round(int8_step_s, 4)
        result["vs_baseline_int8"] = round(BASELINE_STEP_S / int8_step_s, 3)
        # int8 MXU roofline (the GEMM FLOPs run at the 394 TF/s int8 peak)
        result["mfu_pct_int8"] = round(100.0 * flops576 / int8_step_s / 1e12
                                       / PEAK_INT8_TFLOPS, 1)
    if int8_step384_s is not None:
        result["int8_step_384x672_s"] = round(int8_step384_s, 4)
    if step384_s is not None:
        result["denoise_step_384x672_s"] = round(step384_s, 4)
        # A100 anchor at this resolution: 290 s * 0.8 / 50 = 4.64 s/step
        result["vs_baseline_384x672"] = round(290.0 * 0.8 / 50.0 / step384_s, 3)
        result["mfu_pct_384x672"] = round(100.0 * flops384 / step384_s / 1e12
                                          / PEAK_BF16_TFLOPS, 1)
        # non-denoise stages MEASURED on this chip by bench_stages.py
        # (VAE decode + condition encodes + 5 depth-UNet steps + warp +
        # host-I/O slack; replaces the earlier 80%-attribution guess).
        # Prefer the committed bench_stages.json so the aggregate tracks
        # the latest stage measurements; the literals are the 2026-08-17
        # snapshot.
        non_denoise_s, non_denoise_576_s = 23.6, 32.8
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_stages.json")) as f:
                stages = json.load(f)
            non_denoise_s = float(stages["non_denoise_s"])
            non_denoise_576_s = float(stages.get("non_denoise_576x1024_s",
                                                 non_denoise_576_s))
        except Exception:
            pass
        result["est_sec_per_video_384x672"] = round(
            50.0 * step384_s + non_denoise_s, 1)
        result["vs_baseline_video"] = round(
            290.0 / (50.0 * step384_s + non_denoise_s), 3)
        if int8_step384_s is not None:
            result["est_sec_per_video_384x672_int8"] = round(
                50.0 * int8_step384_s + non_denoise_s, 1)
            result["vs_baseline_video_int8"] = round(
                290.0 / (50.0 * int8_step384_s + non_denoise_s), 3)
        # headline-config end-to-end: this run's measured 576x1024 step +
        # bench_stages' measured 576x1024 non-denoise legs
        result["measured_sec_per_video_576x1024"] = round(
            50.0 * step_s + non_denoise_576_s, 1)
        # --- 8-chip slice PROJECTION (not a measurement: one chip here) ---
        # Per-stage scaling model (project_8chip_stages docstring): denoise
        # by dp x sp with an explicit ring-KV + CFG-allreduce ICI term,
        # depth/VAE spatially sharded with a halo efficiency, warp by
        # frame-count load balance, host mp4 work not divided.  Requires the
        # committed per-stage measurements (bench_stages.json).
        try:
            best384 = min(s for s in (int8_step384_s, step384_s)
                          if s is not None)
            p384 = project_8chip_stages(
                best384, stages, flops384, "384x672", sv=sv384, st=text_len)
            result["projected_8chip_stages_384x672"] = p384
            result["projected_8chip_video_384x672_s"] = p384["total_s"]
            result["projected_8chip_vs_baseline_video"] = round(
                290.0 / p384["total_s"], 2)
            best576 = min(s for s in (int8_step_s, step_s) if s is not None)
            p576 = project_8chip_stages(
                best576, stages, flops576, "576x1024", sv=sv576, st=text_len)
            result["projected_8chip_stages_576x1024"] = p576
            result["projected_8chip_video_576x1024_s"] = p576["total_s"]
        except Exception as e:
            print(f"# 8-chip projection skipped: {e}", file=sys.stderr)
        result["projection_note"] = (
            "8-chip numbers are per-stage projections from single-chip "
            "measurements (formulas: bench.py project_8chip_stages); "
            "shardings execute + bit-match on a virtual 8-device mesh "
            "(dryrun_multichip) but no multi-chip hardware exists in this "
            "environment")
        # single ORCHESTRATED end-to-end run (bench_e2e.py: full-scale
        # synthetic weights, stage offload, all five mp4 outputs)
        def fold_e2e(fname, suffix):
            try:
                with open(os.path.join(
                        os.path.dirname(os.path.abspath(__file__)), fname)) as f:
                    e2e = json.load(f)
                result["e2e_sec_per_video_384x672_orchestrated"
                       + suffix] = float(e2e["value"])
                # the per-video on-device param re-synthesis is a synthetic-
                # bench artifact (production pushes converted weights over
                # PCIe in seconds); the excl figure is the production-
                # equivalent orchestrated time and is far less noisy (the
                # relay's synth dispatch cost varies ~2-6x between runs)
                bd = e2e.get("stage_breakdown_warm_s", {})
                synth = sum(v for k, v in bd.items()
                            if k.startswith("synth_")
                            and isinstance(v, (int, float)))
                if synth:
                    result["e2e_excl_resynthesis_s" + suffix] = round(
                        float(e2e["value"]) - synth, 1)
            except Exception:
                pass

        fold_e2e("bench_e2e.json", "")
        fold_e2e("bench_e2e_int8.json", "_int8")
        # measured 2-segment autoregressive run (bench_e2e.py --autoregressive)
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_autoregressive.json")) as f:
                result["autoregressive_2seg_s"] = float(
                    json.load(f)["autoregressive_2seg_s"])
        except Exception:
            pass
        # same-seed bf16-vs-int8 quality gate (bench_e2e.py --ab): the
        # decision artifact behind the int8-by-default question
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_int8_ab.json")) as f:
                ab = json.load(f)
            result["int8_ab"] = {
                k: ab[k] for k in ("psnr_db", "psnr_min_frame_db", "ssim",
                                   "ssim_min_frame", "pass", "psnr_pass_db",
                                   "weights") if k in ab
            }
        except Exception:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
