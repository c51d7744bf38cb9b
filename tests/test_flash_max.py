"""Two-pass true-max exp2 flash kernel (ops/pallas/flash_max.py).

CPU interpret-mode parity vs the XLA einsum, specifically at score
distributions the fixed-bias exp2 kernel is NOT safe for: unbounded
magnitudes (no QK-norm, like the DepthCrafter SVD UNet) and all-negative
score rows (where analytic pad corrections catastrophically cancel).
Chip-compiled assertions live in tests/test_attention_tpu.py (-m tpu).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from trajectorycrafter_tpu.ops.attention import _xla_attention
from trajectorycrafter_tpu.ops.pallas.flash_max import flash_attention_maxpass


def _attn_ref(q, k, v, scale):
    return np.asarray(_xla_attention(q, k, v, scale), np.float32)


def _run(q, k, v, scale, kv_pad=0, block=128):
    out_t = flash_attention_maxpass(
        q, k, v, kv_pad=kv_pad, sm_scale=scale,
        block_q=block, block_k=block, interpret=True)
    return np.asarray(jnp.swapaxes(out_t, 2, 3), np.float32)


def test_matches_xla_unbounded_scores(rng):
    # score std ~ scale * |q||k| with amplitude 6 -> scores span ~[-90, 90]:
    # far outside any fixed-bias clamp window, exact for the true-max kernel
    b, h, s, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 6, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 6, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    scale = d**-0.5
    np.testing.assert_allclose(_run(q, k, v, scale), _attn_ref(q, k, v, scale),
                               atol=2e-5, rtol=1e-4)


def test_matches_xla_all_negative_rows(rng):
    # every real score far below zero: the fixed-bias pad-correction regime
    # that loses precision analytically; the masked two-pass kernel is exact
    b, h, s, d = 1, 1, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) + 4.0, jnp.float32)
    k = jnp.asarray(-(rng.standard_normal((b, h, s, d)) * 0.1 + 4.0), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    scale = d**-0.5
    got = _run(q, k, v, scale)
    want = _attn_ref(q, k, v, scale)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("s_real", [200, 256])
def test_padded_keys_masked(rng, s_real):
    # pad contract of the dispatch layer: zero-padded tail keys must not
    # contribute (masking inside the kernel, no analytic correction)
    b, h, d, block = 1, 2, 32, 128
    s_pad = -(-s_real // block) * block
    q = jnp.asarray(rng.standard_normal((b, h, s_pad, d)) * 3, jnp.float32)
    k_real = rng.standard_normal((b, h, s_real, d)) * 3
    v_real = rng.standard_normal((b, h, s_real, d))
    k = jnp.asarray(np.concatenate(
        [k_real, np.zeros((b, h, s_pad - s_real, d))], 2), jnp.float32)
    v = jnp.asarray(np.concatenate(
        [v_real, np.zeros((b, h, s_pad - s_real, d))], 2), jnp.float32)
    scale = d**-0.5
    got = _run(q, k, v, scale, kv_pad=s_pad - s_real)
    want = _attn_ref(q, jnp.asarray(k_real, jnp.float32),
                     jnp.asarray(v_real, jnp.float32), scale)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dispatch_layer_flash_max(rng):
    # multi_head_attention(impl="flash_max") pads + unpads correctly
    from trajectorycrafter_tpu.ops.attention import _flash_maxpass

    b, h, s, d = 1, 2, 300, 32  # does not divide the 512 dev block
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    scale = d**-0.5
    import unittest.mock as mock

    from trajectorycrafter_tpu.ops.pallas import flash_max as fm

    orig = fm.flash_attention_maxpass
    with mock.patch.object(
        fm, "flash_attention_maxpass",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ):
        got = np.asarray(_flash_maxpass(q, k, v, scale), np.float32)
    np.testing.assert_allclose(got, _attn_ref(q, k, v, scale),
                               atol=2e-5, rtol=1e-4)
