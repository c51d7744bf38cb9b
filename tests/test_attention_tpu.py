"""Real-TPU assertions for the Pallas attention kernels (pytest -m tpu).

The default suite forces a CPU mesh, so the production ``impl="flash"`` path
(the exp2/MXU-offload kernel, ops/pallas/flash_exp2.py) was previously only
exercised by benchmarks.  These tests run on the actual chip via
``tests/run_tpu_tests.sh`` and pin the kernel to the XLA einsum reference at
fixed seeds, so kernel regressions fail an assertion rather than a PSNR eyeball.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform == "cpu",
        reason="needs the real TPU (run via tests/run_tpu_tests.sh)",
    ),
]


def _qkv(b, h, s, d, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((b, h, s, d)), dtype),
        jnp.asarray(rng.standard_normal((b, h, s, d)), dtype),
        jnp.asarray(rng.standard_normal((b, h, s, d)), dtype),
    )


@pytest.mark.parametrize("s", [1800, 2048, 5000])
def test_flash_exp2_matches_xla(s):
    """Production kernel vs XLA einsum, incl. odd lengths (pad correction)."""
    from trajectorycrafter_tpu.ops.attention import _flash_exp2_t, _xla_attention

    q, k, v = _qkv(2, 4, s, 64)
    scale = 64**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: _flash_exp2_t(q, k, v, scale))(
        q, k, v), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


def test_flash_exp2_cross_attention_shape():
    """Distinct q/kv lengths (Perceiver cross-attention pattern)."""
    from trajectorycrafter_tpu.ops.attention import _flash_exp2_t, _xla_attention

    q, _, _ = _qkv(1, 8, 4200, 64, seed=1)
    _, k, v = _qkv(1, 8, 900, 64, seed=2)
    scale = 64**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(_flash_exp2_t(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


def test_flash_max_matches_xla():
    """Two-pass true-max kernel on chip vs the XLA einsum, soft-softmax
    regime (amplitude 1, the same tolerance envelope as the exp2 kernel)."""
    from trajectorycrafter_tpu.ops.attention import _flash_maxpass, _xla_attention

    q, k, v = _qkv(1, 4, 3000, 64, seed=7)
    scale = 64**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: _flash_maxpass(q, k, v, scale))(
        q, k, v), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


def test_flash_max_unbounded_scores_stay_finite():
    """Amplitude-4 scores (span ~±130: overflows a fixed-bias exp(s) without
    the true max) -- the kernel must stay finite and close to the einsum.
    Tolerance is wide: in the sharp-softmax regime bf16 rounding of the
    pre-scaled q amplifies near-tie mixing weights identically in principle
    but not bit-identically across the two implementations (measured max
    |err| ~0.07 at amplitude 3 on chip); exactness in exact arithmetic is
    asserted in fp32 interpret mode (tests/test_flash_max.py, atol 2e-5)."""
    from trajectorycrafter_tpu.ops.attention import _flash_maxpass, _xla_attention

    rng = np.random.default_rng(8)
    b, h, s, d = 1, 4, 3000, 64
    mk = lambda a: jnp.asarray(rng.standard_normal((b, h, s, d)) * a, jnp.bfloat16)
    q, k, v = mk(4), mk(4), mk(1)
    scale = 64**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: _flash_maxpass(q, k, v, scale))(
        q, k, v), np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=0.15, rtol=5e-2)


def test_stock_flash_matches_xla():
    """The stock jax flash kernel path (impl="flash_stock") stays correct."""
    from trajectorycrafter_tpu.ops.attention import _flash_attention, _xla_attention

    q, k, v = _qkv(1, 4, 3000, 64, seed=3)
    scale = 64**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(jax.jit(lambda q, k, v: _flash_attention(q, k, v, scale))(
        q, k, v), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


def test_dit_forward_flash_vs_xla():
    """A small DiT forward with impl='flash' agrees with impl='xla' on chip."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel

    def build(impl):
        return CrossTransformer3DModel(
            num_attention_heads=4, attention_head_dim=64, in_channels=9,
            out_channels=4, time_embed_dim=32, text_embed_dim=64, num_layers=2,
            max_text_seq_length=8, cross_attn_dim_head=64, cross_attn_num_heads=4,
            use_rotary_positional_embeddings=True, attention_impl=impl,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )

    rng = np.random.default_rng(0)
    b, f, h, w = 1, 4, 16, 24
    args = (
        jnp.asarray(rng.standard_normal((b, f, h, w, 4)), jnp.bfloat16),
        jnp.asarray(rng.standard_normal((b, 8, 64)), jnp.bfloat16),
        jnp.asarray([100.0]),
        jnp.asarray(rng.standard_normal((b, f, h, w, 5)), jnp.bfloat16),
        jnp.asarray(rng.standard_normal((b, 1, h, w, 4)), jnp.bfloat16),
    )
    xla_model = build("xla")
    params = jax.jit(xla_model.init)(jax.random.PRNGKey(0), *args)["params"]
    want = np.asarray(
        jax.jit(lambda p, *a: xla_model.apply({"params": p}, *a))(params, *args),
        np.float32)
    flash_model = build("flash")
    got = np.asarray(
        jax.jit(lambda p, *a: flash_model.apply({"params": p}, *a))(params, *args),
        np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=5e-2)
