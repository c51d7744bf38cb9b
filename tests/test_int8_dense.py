"""int8 GEMM path (ops/int8.py + CrossTransformer3DModel quant="int8")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_int8_dense_matches_dense(rng):
    import flax.linen as nn

    from trajectorycrafter_tpu.ops.int8 import Int8Dense, quantize_dense_params

    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    dense = nn.Dense(32)
    p = dense.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(dense.apply({"params": p}, x))

    qp = quantize_dense_params(p)
    assert qp["kernel_q"].dtype == jnp.int8
    got = np.asarray(Int8Dense(32).apply({"params": qp}, x))
    # weight + activation int8: ~1% relative error budget
    assert np.abs(got - want).max() / np.abs(want).max() < 0.02
    cos = float((got * want).sum() /
                (np.linalg.norm(got) * np.linalg.norm(want)))
    assert cos > 0.999


def _tiny_kwargs():
    c = 4
    return dict(num_attention_heads=2, attention_head_dim=16,
                in_channels=2 * c + 1, out_channels=c, time_embed_dim=16,
                text_embed_dim=8, num_layers=2, max_text_seq_length=3,
                cross_attn_dim_head=8, cross_attn_num_heads=2,
                use_rotary_positional_embeddings=True, attention_impl="xla")


@pytest.fixture(scope="module")
def tiny_io():
    rng = np.random.default_rng(0)
    f, h, w, c = 2, 4, 4, 4
    return (
        jnp.asarray(rng.standard_normal((1, f, h, w, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 3, 8)), jnp.float32),
        jnp.asarray([300.0]),
        jnp.asarray(rng.standard_normal((1, f, h, w, c + 1)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 1, h, w, c)), jnp.float32),
    )


@pytest.mark.slow
def test_quantized_dit_matches_bf16_tree_and_forward(tiny_io):
    """quantize_dit_params produces exactly the int8 model's param tree, and
    the int8 forward tracks the fp32 forward closely (the flag the bench
    measures: 13.6 -> 12.6 s/step at 49f@576x1024, docs/COVERAGE.md)."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.ops.int8 import quantize_dit_params

    hidden, text, t, inpaint, cross = tiny_io
    m_ref = CrossTransformer3DModel(**_tiny_kwargs())
    m_i8 = CrossTransformer3DModel(quant="int8", **_tiny_kwargs())
    params = m_ref.init(jax.random.PRNGKey(0), hidden, text, t, inpaint,
                        cross)["params"]
    qparams = quantize_dit_params(params)

    import jax.tree_util as jtu

    want_tree = jax.eval_shape(
        lambda: m_i8.init(jax.random.PRNGKey(0), hidden, text, t, inpaint,
                          cross))["params"]
    a = {jtu.keystr(p): (np.shape(l), l.dtype)
         for p, l in jtu.tree_flatten_with_path(qparams)[0]}
    b = {jtu.keystr(p): (np.shape(l), l.dtype)
         for p, l in jtu.tree_flatten_with_path(want_tree)[0]}
    assert a == b

    want = np.asarray(m_ref.apply({"params": params}, hidden, text, t,
                                  inpaint_latents=inpaint, cross_latents=cross))
    got = np.asarray(m_i8.apply({"params": qparams}, hidden, text, t,
                                inpaint_latents=inpaint, cross_latents=cross))
    rel = np.abs(got - want).max() / np.abs(want).max()
    cos = float((got * want).sum() /
                (np.linalg.norm(got) * np.linalg.norm(want)))
    assert rel < 0.05, rel
    assert cos > 0.999, cos


@pytest.mark.slow
def test_orchestrator_end_to_end_with_int8(tmp_path):
    """The product --quant int8 path: dev-stub pipeline runs gradual mode
    with quantized block GEMMs and produces finite mp4 outputs."""
    import os

    from trajectorycrafter_tpu.config import TrajCrafterConfig
    from trajectorycrafter_tpu.orchestrator import TrajCrafter
    from trajectorycrafter_tpu.utils.video import save_video

    rng = np.random.default_rng(0)
    path = str(tmp_path / "in.mp4")
    save_video(rng.uniform(0, 1, (6, 48, 80, 3)).astype(np.float32), path, fps=5)

    cfg = TrajCrafterConfig()
    cfg.allow_dev_stubs = True
    cfg.video_path = path
    cfg.video_length = 9
    cfg.warp_size = (48, 80)
    cfg.diffusion.sample_size = (32, 48)
    cfg.diffusion.num_inference_steps = 2
    cfg.diffusion.prompt = "a scene"
    cfg.diffusion.quant = "int8"
    cfg.render.camera = "target"
    cfg.render.target_pose = (10.0, -5.0, 0.1, 0.0, 0.0)
    cfg.save_dir = str(tmp_path / "out")

    gen = TrajCrafter(cfg).infer_gradual()
    assert gen.shape == (9, 32, 48, 3)
    assert np.all(np.isfinite(gen))
    assert os.path.getsize(os.path.join(cfg.save_dir, "gen.mp4")) > 0


def test_quantize_targets_block_and_perceiver_denses(tiny_io):
    """blocks_* attn/FF kernels and perceiver projections become kernel_q;
    patch / time / output layers stay bf16 (kernel key preserved)."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.ops.int8 import quantize_dit_params

    hidden, text, t, inpaint, cross = tiny_io
    model = CrossTransformer3DModel(**_tiny_kwargs())
    params = model.init(jax.random.PRNGKey(0), hidden, text, t, inpaint,
                        cross)["params"]
    q = quantize_dit_params(params)
    assert "kernel_q" in q["perceiver_cross_attention_0"]["to_q"]
    assert "kernel_q" in q["perceiver_cross_attention_0"]["to_kv"]
    assert "kernel_q" in q["perceiver_cross_attention_0"]["to_out"]
    assert "kernel" in q["proj_out"]
    assert "kernel" in q["patch_embed_proj"]
    assert "kernel_q" in q["blocks_0"]["attn1"]["to_q"]
    assert "kernel_q" in q["blocks_1"]["ff"]["proj_out"]
    # AdaLN modulation denses inside blocks stay bf16
    assert "kernel" in q["blocks_0"]["norm1"]["linear"]


def test_pallas_int8_matmul_matches_xla_int8(rng):
    """The blocked Pallas GEMM (interpret mode) reproduces the XLA int8
    path bit-for-bit at a multi-K-block shape, incl. fused bias and the
    M-padding wrapper."""
    from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
        int8_dense_apply, quantize_rows)

    x = jnp.asarray(rng.standard_normal((2, 70, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)), jnp.float32)
    ws = jnp.maximum(jnp.abs(w).max(0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    bias = jnp.asarray(rng.standard_normal(384), jnp.float32)

    got = np.asarray(int8_dense_apply(x, wq, ws, bias=bias,
                                      out_dtype=jnp.float32, interpret=True))
    xq, xs = quantize_rows(x.reshape(-1, 256))
    want = np.asarray(
        (xq.astype(jnp.int32) @ wq.astype(jnp.int32)).astype(jnp.float32)
        * xs[:, None] * np.asarray(ws)[None, :] + np.asarray(bias)
    ).reshape(2, 70, 384)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_int8_dense_impl_dispatch(rng):
    """impl="auto" stays on the XLA path off-TPU (pallas engages only on an
    unmeshed TPU backend); impl="xla" and the default produce identical
    results."""
    from trajectorycrafter_tpu.ops.int8 import Int8Dense, quantize_dense_params
    import flax.linen as nn

    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    p = nn.Dense(32).init(jax.random.PRNGKey(0), x)["params"]
    qp = quantize_dense_params(p)
    auto = np.asarray(Int8Dense(32).apply({"params": qp}, x))
    xla = np.asarray(Int8Dense(32, impl="xla").apply({"params": qp}, x))
    np.testing.assert_array_equal(auto, xla)


def test_quantize_rows_pallas_matches_xla(rng):
    """Single-pass Pallas row quantization == the two-pass XLA formula.

    The scale may differ by 1 ULP (divide vs reciprocal-multiply
    lowering), which can flip round-half-even at exact .5 quant
    boundaries -- allow +/-1 code on a tiny fraction of elements."""
    from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
        quantize_rows, quantize_rows_pallas)

    x = jnp.asarray(rng.standard_normal((512, 384)), jnp.bfloat16)
    xq, xs = quantize_rows_pallas(x, interpret=True)
    want_q, want_s = quantize_rows(x)
    diff = np.abs(np.asarray(xq, np.int32) - np.asarray(want_q, np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3
    np.testing.assert_allclose(np.asarray(xs[:, 0]), np.asarray(want_s),
                               rtol=1e-6)
    assert xs.shape == (512, 128)


def test_quant_block_m_respects_vmem_budget():
    """The row-quant block must divide M and keep ~14*block*K bytes of
    in-flight VMEM under the 11 MB budget (the fixed 512/128 blocks OOMed
    the 16 MB scoped-VMEM limit on chip at K=3072/12288)."""
    from trajectorycrafter_tpu.ops.pallas.int8_matmul import _quant_block_m

    budget = 11 * 1024 * 1024
    for m, k in [(1024, 3072), (1024, 12288), (512, 12288), (60416, 3072),
                 (512, 256), (8, 1024)]:
        bm = _quant_block_m(m, k)
        assert bm is not None and m % bm == 0
        assert 14 * bm * k <= budget, (m, k, bm)
    # production DiT shapes keep the single-pass path
    assert _quant_block_m(60416, 3072) >= 128
    # no fitting divisor -> None (fall back to the XLA lowering)
    assert _quant_block_m(7, 3072) is None
    assert _quant_block_m(1024, 10**7) is None


def test_int8_impl_env_escape_hatch(monkeypatch):
    """Auto routing defaults to XLA (measured faster on-chip, bench_int8.py);
    TRAJCRAFTER_INT8_IMPL=pallas is the opt-in, gated on an unmeshed TPU."""
    from trajectorycrafter_tpu.ops.int8 import pallas_int8_ok

    monkeypatch.setenv("TRAJCRAFTER_INT8_IMPL", "xla")
    assert not pallas_int8_ok(3072, 3072)
    monkeypatch.delenv("TRAJCRAFTER_INT8_IMPL")
    assert not pallas_int8_ok(3072, 3072)
    monkeypatch.setenv("TRAJCRAFTER_INT8_IMPL", "pallas")
    # still gated on backend/mesh/alignment; on CPU it stays off
    import jax
    expected = jax.default_backend() == "tpu"
    assert pallas_int8_ok(3072, 3072) == expected
    assert not pallas_int8_ok(3072, 3070)


@pytest.mark.slow
def test_quantized_depth_unet_matches_bf16_tree_and_forward(rng):
    """quant="int8" on the SVD depth UNet: the quantized param tree matches
    the int8 model's init structure exactly, only the intended GEMMs are
    converted, and the forward tracks fp32 closely."""
    from trajectorycrafter_tpu.models.depthcrafter import (
        UNetSpatioTemporalConditionModel,
    )
    from trajectorycrafter_tpu.ops.int8 import quantize_depth_unet_params

    kw = dict(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
              num_attention_heads=(1, 2, 2, 2), cross_attention_dim=8,
              addition_time_embed_dim=4, norm_num_groups=4)
    unet = UNetSpatioTemporalConditionModel(**kw)
    b, f, hh, ww = 1, 3, 16, 16
    sample = jnp.asarray(rng.standard_normal((b, f, hh, ww, 8)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, f, 1, 8)), jnp.float32)
    added = jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), sample, t, ctx,
                                added)["params"]
    want = np.asarray(unet.apply({"params": params}, sample, t, ctx, added))

    qparams = quantize_depth_unet_params(params)
    # targeted leaves converted...
    blk = qparams["down_0_attn_0"]["transformer_blocks_0"]
    assert "kernel_q" in blk["attn1"]["to_k"]
    assert "kernel_q" in blk["attn1"]["to_q"]
    assert "kernel_q" in blk["ff"]["proj_in"]
    assert "kernel_q" in qparams["down_0_attn_0"]["proj_in"]
    assert "kernel_q" in qparams["mid_attn"]["proj_out"]
    # ...cross-attn k/v, embeds, and convs untouched
    assert "kernel" in blk["attn2"]["to_k"]
    assert "kernel" in qparams["down_0_attn_0"]["time_pos_embed_linear_1"]
    assert "kernel" in qparams["time_embedding_linear_1"]
    assert "kernel" in qparams["down_0_res_0"]["spatial_res_block"]["conv1"]

    qunet = UNetSpatioTemporalConditionModel(quant="int8", **kw)
    qinit = jax.jit(qunet.init)(jax.random.PRNGKey(0), sample, t, ctx,
                                added)["params"]
    assert (jax.tree_util.tree_structure(qinit)
            == jax.tree_util.tree_structure(qparams))
    # load-path placement contracts: kernel_q stays int8 with an fp32
    # scale side-car, everything else casts (checkpoints/offload)
    from trajectorycrafter_tpu.utils.checkpoints import _place_quantized
    from trajectorycrafter_tpu.utils.offload import host_cast

    placed = _place_quantized(qparams, jnp.bfloat16)
    pblk = placed["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]
    assert pblk["kernel_q"].dtype == jnp.int8
    assert pblk["scale"].dtype == jnp.float32
    assert placed["conv_in"]["kernel"].dtype == jnp.bfloat16
    hosted = host_cast(qparams, jnp.bfloat16)
    hblk = hosted["down_0_attn_0"]["transformer_blocks_0"]["attn1"]["to_q"]
    assert hblk["kernel_q"].dtype == np.int8
    assert hblk["scale"].dtype == np.float32

    got = np.asarray(qunet.apply({"params": qparams}, sample, t, ctx, added))
    assert got.shape == want.shape
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.05, (
        np.abs(got - want).mean() / denom)
    cos = float((got * want).sum() /
                (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12))
    assert cos > 0.999
