"""Tests for the CrossTransformer3D DiT (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.ops.posemb import get_3d_sincos_pos_embed, timestep_embedding
from trajectorycrafter_tpu.ops.rope import (
    apply_rotary_emb,
    get_resize_crop_region_for_grid,
    rope_for_sample,
)

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,  # multiple of 8 so the RoPE t:h:w split is even
    in_channels=9,  # 4 noise + 5 inpaint
    out_channels=4,
    time_embed_dim=16,
    text_embed_dim=32,
    num_layers=4,
    sample_width=12,
    sample_height=8,
    sample_frames=9,
    max_text_seq_length=7,
    cross_attn_dim_head=8,
    cross_attn_num_heads=4,
    attention_impl="xla",
)


def _inputs(rng, use_cross=True):
    b, f, h, w = 1, 3, 8, 12
    hidden = jnp.asarray(rng.standard_normal((b, f, h, w, 4)).astype(np.float32))
    inpaint = jnp.asarray(rng.standard_normal((b, f, h, w, 5)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((b, 7, 32)).astype(np.float32))
    cross = (
        jnp.asarray(rng.standard_normal((b, 2, h, w, 4)).astype(np.float32))
        if use_cross else None
    )
    t = jnp.asarray([311.0])
    return hidden, text, t, inpaint, cross


@pytest.fixture(scope="module")
def tiny_dit():
    model = CrossTransformer3DModel(**TINY, use_rotary_positional_embeddings=False)
    rng = np.random.default_rng(0)
    args = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    return model, params


def test_forward_shape(tiny_dit, rng):
    model, params = tiny_dit
    hidden, text, t, inpaint, cross = _inputs(rng)
    out = model.apply({"params": params}, hidden, text, t, inpaint, cross)
    assert out.shape == (1, 3, 8, 12, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cross_latents_matter(tiny_dit, rng):
    """The Perceiver branch must influence the output."""
    model, params = tiny_dit
    hidden, text, t, inpaint, cross = _inputs(rng)
    out1 = model.apply({"params": params}, hidden, text, t, inpaint, cross)
    out2 = model.apply({"params": params}, hidden, text, t, inpaint, cross + 1.0)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_timestep_matters(tiny_dit, rng):
    model, params = tiny_dit
    hidden, text, t, inpaint, cross = _inputs(rng)
    out1 = model.apply({"params": params}, hidden, text, t, inpaint, cross)
    out2 = model.apply({"params": params}, hidden, text, jnp.asarray([900.0]), inpaint, cross)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_rope_model_runs(rng):
    model = CrossTransformer3DModel(**TINY, use_rotary_positional_embeddings=True)
    hidden, text, t, inpaint, cross = _inputs(rng)
    rope = rope_for_sample(
        TINY["attention_head_dim"], height=8 * 8, width=12 * 8, num_latent_frames=3
    )
    rope = (jnp.asarray(rope[0]), jnp.asarray(rope[1]))
    assert rope[0].shape == (3 * 4 * 6, 16)
    params = model.init(jax.random.PRNGKey(0), hidden, text, t, inpaint, cross,
                        image_rotary_emb=rope)["params"]
    out = model.apply({"params": params}, hidden, text, t, inpaint, cross,
                      image_rotary_emb=rope)
    assert out.shape == (1, 3, 8, 12, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rope_table_reference_shape():
    """Deployed scale: 13 latent frames @480x720 -> 17550 x 64 tables
    (reference crosstransformer3d.py:1126-1129)."""
    cos, sin = rope_for_sample(64, height=480, width=720, num_latent_frames=13)
    assert cos.shape == (17550, 64) and sin.shape == (17550, 64)
    # channel split 16 : 24 : 24 (t : h : w)
    assert np.all(np.abs(cos) <= 1.0) and np.all(np.abs(sin) <= 1.0)


def test_crop_region_centres():
    (top, left), (bot, right) = get_resize_crop_region_for_grid((24, 42), 45, 30)
    assert 0 <= top and bot <= 30 and 0 <= left and right <= 45


def test_apply_rotary_matches_manual(rng):
    x = rng.standard_normal((2, 3, 6, 8)).astype(np.float32)  # (B,H,S,D)
    ang = rng.uniform(0, np.pi, (6, 4)).astype(np.float32)
    cos = np.repeat(np.cos(ang), 2, axis=1)
    sin = np.repeat(np.sin(ang), 2, axis=1)
    got = np.asarray(apply_rotary_emb(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    # manual interleaved-pair rotation
    want = np.empty_like(x)
    want[..., 0::2] = x[..., 0::2] * cos[..., 0::2] - x[..., 1::2] * sin[..., 0::2]
    want[..., 1::2] = x[..., 1::2] * cos[..., 1::2] + x[..., 0::2] * sin[..., 1::2]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sincos_pos_embed_shape_and_values():
    emb = get_3d_sincos_pos_embed(16, (6, 4), 3)
    assert emb.shape == (3, 24, 16)
    # temporal block identical across space, spatial block identical across time
    np.testing.assert_allclose(emb[:, 0, :4], emb[:, 5, :4])
    np.testing.assert_allclose(emb[0, :, 4:], emb[2, :, 4:])


def test_timestep_embedding_flip():
    t = jnp.asarray([0.0])
    emb = np.asarray(timestep_embedding(t, 8, flip_sin_to_cos=True))
    # at t=0: cos-half (first) = 1, sin-half (second) = 0
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)
