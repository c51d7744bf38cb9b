"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Covers the inference path (CFG pair on dp, heads on tp, video tokens on sp)
and the parameter sharding rules -- the pattern the driver's
dryrun_multichip validates for training.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.parallel import dit_param_sharding, make_mesh


def _model_and_inputs(shard_activations):
    model = CrossTransformer3DModel(
        num_attention_heads=4, attention_head_dim=16, in_channels=9,
        out_channels=4, time_embed_dim=16, text_embed_dim=32, num_layers=2,
        max_text_seq_length=8, cross_attn_dim_head=16, cross_attn_num_heads=4,
        use_rotary_positional_embeddings=False, attention_impl="xla",
        sample_width=12, sample_height=8, sample_frames=9,
        shard_activations=shard_activations,
    )
    b, f, h, w = 2, 4, 8, 12  # 4*4*6 = 96 video tokens
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.standard_normal((b, f, h, w, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 8, 32)).astype(np.float32)),
        jnp.asarray([100.0, 100.0]),
        jnp.asarray(rng.standard_normal((b, f, h, w, 5)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 1, h, w, 4)).astype(np.float32)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    return model, params, args


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_inference_matches_single_device():
    """dp x sp x tp sharded forward == unsharded forward."""
    model, params, args = _model_and_inputs(shard_activations=False)
    want = np.asarray(model.apply({"params": params}, *args))

    model_s, _, _ = _model_and_inputs(shard_activations=True)
    mesh = make_mesh(dp=2, sp=2, tp=2)
    p_shard = dit_param_sharding(params, mesh)
    params_s = jax.device_put(params, p_shard)
    args_s = [
        jax.device_put(a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1)))))
        for a in args
    ]
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(
            lambda p, *a: model_s.apply({"params": p}, *a)
        )(params_s, *args_s))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_param_sharding_rules_split_heads():
    model, params, _ = _model_and_inputs(False)
    mesh = make_mesh(dp=2, sp=1, tp=4)
    shardings = dit_param_sharding(params, mesh)
    qk = shardings["blocks_0"]["attn1"]["to_q"]["kernel"]
    assert qk.spec == P(None, "tp")
    out = shardings["blocks_0"]["attn1"]["to_out"]["kernel"]
    assert out.spec == P("tp", None)
    norm = shardings["blocks_0"]["norm1"]["norm"]["scale"]
    assert norm.spec == P()


def _tiny_pipeline(text_len=6):
    """Tiny VAE+DiT pipeline whose joint sequence (text 6 + video 18 = 24
    tokens) divides the sp axis, for sharded full-__call__ tests."""
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.pipelines import TrajCrafterPipeline
    from trajectorycrafter_tpu.schedulers import DDIMScheduler

    lc = 4
    vae = AutoencoderKLCogVideoX(
        latent_channels=lc, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, norm_num_groups=4,
    )
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 48, 3)))["params"]
    dit = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=16,
        in_channels=2 * lc + 1, out_channels=lc,
        time_embed_dim=16, text_embed_dim=32, num_layers=2,
        sample_width=12, sample_height=8, sample_frames=9,
        max_text_seq_length=text_len, cross_attn_dim_head=8, cross_attn_num_heads=4,
        use_rotary_positional_embeddings=True, attention_impl="xla",
        dtype=jnp.float32,
    )
    b, f, h, w = 1, 3, 4, 6
    dit_params = dit.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, f, h, w, lc)), jnp.zeros((b, text_len, 32)), jnp.zeros((b,)),
        jnp.zeros((b, f, h, w, lc + 1)), jnp.zeros((b, 1, h, w, lc)),
    )["params"]
    return TrajCrafterPipeline(
        vae=vae, vae_params=vae_params, transformer=dit,
        transformer_params=dit_params,
        scheduler=DDIMScheduler(prediction_type="v_prediction"),
        dtype=jnp.float32,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_pipeline_call_matches_unsharded():
    """Full TrajCrafterPipeline.__call__ (condition prep + CFG denoise loop
    + decode) over a dp=2 x sp=2 x tp=2 mesh matches the single-device run.
    This is the driver-facing inference scale-out path (--mesh_dp/sp/tp)."""
    pipe = _tiny_pipeline()
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(0, 1, (1, 9, 32, 48, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(1, 9, 32, 48, 1)) > 0.7).astype(np.float32) * 255.0
    )
    reference = jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 48, 3)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))
    ne = jnp.zeros_like(pe)
    kwargs = dict(num_inference_steps=2, guidance_scale=6.0,
                  key=jax.random.PRNGKey(43))

    want = np.asarray(pipe(pe, ne, video, mask, reference, **kwargs))

    sharded = pipe.with_mesh(make_mesh(dp=2, sp=2, tp=2))
    assert sharded.transformer.attention_impl == "ring"
    got = np.asarray(sharded(pe, ne, video, mask, reference, **kwargs))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
@pytest.mark.slow
def test_cfg_pair_dp_sharding_pipeline_shape():
    """The CFG pair (batch 2) shards cleanly over dp=2."""
    model, params, args = _model_and_inputs(True)
    mesh = make_mesh(dp=2, sp=1, tp=1)
    args_s = [
        jax.device_put(a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1)))))
        for a in args
    ]
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, *a: model.apply({"params": p}, *a))(params, *args_s)
    assert out.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_int8_inference_matches_single_device():
    """--quant int8 composed with --mesh_dp/tp: the quantized tree shards
    under the kernel_q/scale rules and the meshed forward (XLA int8 path;
    the Pallas GEMM is single-chip-only by design) matches unsharded int8."""
    from trajectorycrafter_tpu.ops.int8 import quantize_dit_params

    model, params, args = _model_and_inputs(shard_activations=False)
    qp = quantize_dit_params(params)
    m8 = model.clone(quant="int8")
    want = np.asarray(m8.apply({"params": qp}, *args))

    model_s, _, _ = _model_and_inputs(shard_activations=True)
    m8_s = model_s.clone(quant="int8")
    mesh = make_mesh(dp=2, sp=1, tp=4)
    params_s = jax.device_put(qp, dit_param_sharding(qp, mesh))
    args_s = [
        jax.device_put(a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1)))))
        for a in args
    ]
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(
            lambda p, *a: m8_s.apply({"params": p}, *a)
        )(params_s, *args_s))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_make_mesh_pp_axis_and_shard_batch():
    """make_mesh grows a pp axis for the GPipe runner; shard_batch handles
    scalar leaves (P()) instead of emitting an invalid P('dp') on rank 0."""
    from trajectorycrafter_tpu.parallel import shard_batch

    mesh = make_mesh(dp=2, pp=4)
    assert mesh.shape["pp"] == 4 and mesh.shape["dp"] == 2

    tree = {"x": jnp.ones((4, 3)), "s": jnp.float32(1.0)}
    sh = shard_batch(tree, mesh)
    assert sh["x"].spec == P("dp", None)
    assert sh["s"].spec == P()
    jax.device_put(tree, sh)  # placement actually works

    with pytest.raises(ValueError, match="exceeds"):
        make_mesh(dp=16)
    with pytest.warns(UserWarning, match="stay idle"):
        make_mesh(dp=2)


# ----------------------------------------------------------------------------
# non-denoise stage sharding (round-3 verdict item #2): depth windows, SVD
# VAE, CogVideoX VAE condition-prep, and the warp must produce the SAME
# numbers sharded as on a single device.
# ----------------------------------------------------------------------------


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_warp_matches_single_device():
    from trajectorycrafter_tpu.geometry.cameras import (
        default_c2w, intrinsics_matrix,
    )
    from trajectorycrafter_tpu.ops.splat import forward_warp_batch

    rng = np.random.default_rng(1)
    n, h, w = 6, 24, 32  # n=6 does NOT divide 8: exercises GSPMD padding
    frames = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(2, 4, (n, h, w)).astype(np.float32))
    pose_s = jnp.tile(jnp.asarray(default_c2w())[None], (n, 1, 1))
    pose_t = pose_s.at[:, 0, 3].add(jnp.linspace(0.0, 0.3, n))
    K = jnp.tile(intrinsics_matrix(30.0, w / 2, h / 2)[None], (n, 1, 1))

    want = [np.asarray(x) for x in forward_warp_batch(
        frames, depths, pose_s, pose_t, K)]
    mesh = make_mesh(dp=2, sp=2, tp=2)
    got = [np.asarray(x) for x in forward_warp_batch(
        frames, depths, pose_s, pose_t, K, mesh=mesh)]
    for g, x in zip(got, want):
        # sharded reductions reassociate the soft z-buffer sums: ~2e-5 noise
        np.testing.assert_allclose(g, x, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_svd_vae_matches_single_device():
    from trajectorycrafter_tpu.models.svd_vae import (
        AutoencoderKLTemporalDecoder, svd_decode_chunked, svd_encode_chunked,
    )

    vae = AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 64, 64))
    frames = jnp.zeros((1, 4, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), frames)["params"]
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 5, 32, 32, 3)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((1, 5, 4, 4, 4)).astype(np.float32))

    want_enc = np.asarray(svd_encode_chunked(vae, params, frames, chunk=4))
    want_dec = np.asarray(svd_decode_chunked(vae, params, z, chunk=4))
    mesh = make_mesh(dp=2, sp=2, tp=2)
    with jax.set_mesh(mesh):
        got_enc = np.asarray(svd_encode_chunked(vae, params, frames, chunk=4,
                                                shard=True))
        got_dec = np.asarray(svd_decode_chunked(vae, params, z, chunk=4,
                                                shard=True))
    np.testing.assert_allclose(got_enc, want_enc, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_dec, want_dec, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_depth_pipeline_matches_single_device():
    """Full windowed depth run (UNet windows + SVD VAE) sharded == single."""
    from trajectorycrafter_tpu.models.depthcrafter import (
        UNetSpatioTemporalConditionModel,
    )
    from trajectorycrafter_tpu.models.svd_vae import AutoencoderKLTemporalDecoder
    from trajectorycrafter_tpu.pipelines.depth import DepthCrafterPipeline

    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        num_attention_heads=(2, 2, 2, 2), cross_attention_dim=12,
        norm_num_groups=4)
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 2, 1, 12)), jnp.zeros((1, 3)))["params"]
    vae = AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 64, 64))
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, 32, 32, 3)))["params"]

    rng = np.random.default_rng(3)
    f, h, w = 6, 64, 64
    frames = rng.uniform(0, 1, (f, h, w, 3)).astype(np.float32)
    embeds = rng.standard_normal((f, 1, 12)).astype(np.float32)
    noises = [rng.standard_normal((4, h // 8, w // 8, 4)).astype(np.float32)
              for _ in range(2)]

    pipe = DepthCrafterPipeline(unet=unet, unet_params=unet_params, vae=vae,
                                vae_params=vae_params, dtype=jnp.float32)
    want = pipe(frames, num_inference_steps=2, window_size=4, overlap=2,
                image_embeddings=embeds, window_noises=noises)
    pipe_s = pipe.with_mesh(make_mesh(dp=2, sp=2, tp=2))
    got = pipe_s(frames, num_inference_steps=2, window_size=4, overlap=2,
                 image_embeddings=embeds, window_noises=noises)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_condition_prep_and_decode_match_single_device():
    """CogVideoX VAE condition prep + decode with spatial (H-on-dp, W-on-sp)
    sharding == single device."""
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.pipelines.trajcrafter import (
        _decode_jit, _prepare_conditions_override_jit,
    )

    vae = AutoencoderKLCogVideoX(
        latent_channels=4, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, norm_num_groups=4)
    params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 48, 3)))["params"]
    rng = np.random.default_rng(4)
    video = jnp.asarray(rng.uniform(0, 1, (1, 5, 32, 48, 3)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(0, 1, (1, 5, 32, 48, 1)) > 0.5).astype(np.float32) * 255.0)
    ref = jnp.asarray(rng.uniform(0, 1, (1, 1, 32, 48, 3)).astype(np.float32))
    ref_noise = jnp.asarray(rng.standard_normal((1, 1, 4, 6, 4)).astype(np.float32))
    aug_noise = jnp.asarray(rng.standard_normal(video.shape).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 4)).astype(np.float32))

    want = _prepare_conditions_override_jit(
        vae, params, video, mask, ref, ref_noise, aug_noise, 0.0563, True,
        vae.scaling_factor, jnp.float32)
    want_dec = np.asarray(_decode_jit(vae, params, z, vae.scaling_factor))

    mesh = make_mesh(dp=2, sp=2, tp=2)
    with jax.set_mesh(mesh):
        got = _prepare_conditions_override_jit(
            vae, params, video, mask, ref, ref_noise, aug_noise, 0.0563, True,
            vae.scaling_factor, jnp.float32, shard=True)
        got_dec = np.asarray(_decode_jit(vae, params, z, vae.scaling_factor,
                                         mesh=mesh))
    for g, x in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(x), atol=2e-4,
                                   rtol=1e-3)
    np.testing.assert_allclose(got_dec, want_dec, atol=2e-4, rtol=1e-3)
