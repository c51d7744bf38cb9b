"""Ring attention correctness on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.ops.attention import _xla_attention
from trajectorycrafter_tpu.ops.ring_attention import (
    _attention_with_lse,
    _combine,
    ring_attention,
)
from trajectorycrafter_tpu.parallel import make_mesh


def test_combine_is_exact(rng):
    """Two-way partial combine equals attention over the concatenated keys."""
    b, h, s, d = 1, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v2 = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    o1, l1 = _attention_with_lse(q, k1, v1, scale)
    o2, l2 = _attention_with_lse(q, k2, v2, scale)
    got, _ = _combine(o1, l1, o2, l2)
    want, _ = _attention_with_lse(
        q, jnp.concatenate([k1, k2], 2), jnp.concatenate([v1, v2], 2), scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("sp", [2, 4, 8])
@pytest.mark.slow
def test_ring_attention_matches_full(rng, sp):
    b, h, s, d = 2, 4, 64, 16  # s divisible by every sp
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    mesh = make_mesh(dp=1, sp=sp, tp=1)
    got = np.asarray(ring_attention(q, k, v, mesh, scale=scale))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_dit_with_ring_attention_matches_xla(rng):
    """Full DiT forward with impl='ring' under an sp mesh == xla impl."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel

    def build(impl):
        return CrossTransformer3DModel(
            num_attention_heads=4, attention_head_dim=16, in_channels=9,
            out_channels=4, time_embed_dim=16, text_embed_dim=32, num_layers=2,
            max_text_seq_length=8, cross_attn_dim_head=16, cross_attn_num_heads=4,
            use_rotary_positional_embeddings=False, attention_impl=impl,
            sample_width=12, sample_height=8, sample_frames=9,
        )

    b, f, h, w = 1, 4, 8, 12  # text 8 + video 96 = 104 tokens (104 % 4 == 0)
    args = (
        jnp.asarray(rng.standard_normal((b, f, h, w, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, 8, 32)).astype(np.float32)),
        jnp.asarray([100.0]),
        jnp.asarray(rng.standard_normal((b, f, h, w, 5)).astype(np.float32)),
        None,  # perceiver branch off (its kv len isn't sp-divisible)
    )
    base = build("xla")
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    want = np.asarray(base.apply({"params": params}, *args))

    mesh = make_mesh(dp=1, sp=4, tp=1)
    ringed = build("ring")
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(
            lambda p, *a: ringed.apply({"params": p}, *a)
        )(params, *args))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_flash_lse_kernel_matches_exact(rng):
    """Pallas flash-with-lse (interpret mode) == exact attention + lse."""
    from trajectorycrafter_tpu.ops.pallas.flash_lse import flash_attention_with_lse

    b, h, s, d = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    want_o, want_lse = _attention_with_lse(q, k, v, scale)
    got_o, got_lse = flash_attention_with_lse(q, k, v, sm_scale=scale,
                                              block_q=128, block_k=128,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.slow
def test_ring_with_flash_inner(rng):
    """Ring attention with the pallas inner (interpret) == full attention."""
    from trajectorycrafter_tpu.ops.pallas.flash_lse import flash_attention_with_lse

    def inner(q, k, v, scale):
        o, lse = flash_attention_with_lse(q, k, v, sm_scale=scale,
                                          block_q=128, block_k=128,
                                          interpret=True)
        return o.astype(jnp.float32), lse

    b, h, s, d = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    mesh = make_mesh(dp=1, sp=4, tp=1)
    got = np.asarray(ring_attention(q, k, v, mesh, scale=scale, inner=inner))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_ring_attention_uneven_tokens_pad_and_mask():
    """S not divisible by the ring size: zero-pad + key-mask must equal the
    exact attention on the true length (round-3 verdict item #6)."""
    from trajectorycrafter_tpu.ops.ring_attention import ring_attention

    mesh = make_mesh(dp=1, sp=8, tp=1)
    rng = np.random.default_rng(5)
    for s in (109, 5, 13):  # 109 % 8 = 5; s < ring size; prime
        q = jnp.asarray(rng.standard_normal((2, 3, s, 16)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 3, s, 16)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 3, s, 16)).astype(np.float32))
        scale = 16**-0.5
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, axis=-1), v)
        got = ring_attention(q, k, v, mesh, axis_name="sp", scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5, err_msg=f"s={s}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
@pytest.mark.parametrize("s,sp", [(109, 4), (109, 8), (5, 8)])
def test_ring_uneven_tokens_with_maskless_flash_inner(rng, s, sp):
    """S % ring != 0 with an inner that does NOT take key_mask (the pallas
    flash-lse wrapper): the analytic zero-key correction must equal exact
    attention, including fully-padded visiting shards (s=5, sp=8)."""
    from trajectorycrafter_tpu.ops.pallas.flash_lse import flash_attention_with_lse

    def inner(q, k, v, scale):  # no key_mask kwarg, like flash_lse_inner
        o, lse = flash_attention_with_lse(q, k, v, sm_scale=scale,
                                          block_q=128, block_k=128,
                                          interpret=True)
        return o.astype(jnp.float32), lse

    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    mesh = make_mesh(dp=1, sp=sp, tp=1)
    got = np.asarray(ring_attention(q, k, v, mesh, scale=scale, inner=inner))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
