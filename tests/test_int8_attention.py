"""int8 flash attention: accuracy vs fp32 attention (interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.ops.pallas.int8_flash_attention import int8_flash_attention


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("s", [256, 384])
def test_int8_attention_close_to_fp32(rng, s):
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_ref_attention(q, k, v, scale))
    got = np.asarray(
        int8_flash_attention(q, k, v, sm_scale=scale, block_q=128, block_k=128,
                             interpret=True)
    ).astype(np.float32)
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 3e-2, err.mean()
    assert np.all(np.isfinite(got))


def test_int8_attention_padding_masked(rng):
    """Odd sequence length: padded keys must not contribute."""
    b, h, s, d = 1, 1, 200, 64  # pads to 256
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    want = np.asarray(_ref_attention(q, k, v, d**-0.5))
    got = np.asarray(
        int8_flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ).astype(np.float32)
    assert got.shape == (b, h, s, d)
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 3e-2


def test_int8_attention_bf16_io(rng):
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32)).astype(jnp.bfloat16)
    got = int8_flash_attention(q, q, q, block_q=128, block_k=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(got, dtype=np.float32)))


# ----------------------------------------------------------------------------
# PV-int8 variant: QK^T bf16, probability x value on the int8 MXU
# ----------------------------------------------------------------------------


@pytest.mark.parametrize("s,pad", [(256, 0), (256, 40), (384, 130)])
def test_pv8_attention_close_to_fp32(rng, s, pad):
    from trajectorycrafter_tpu.ops.pallas.flash_pv8 import (
        flash_attention_exp2_t_pv8,
    )

    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    mask = (jnp.arange(s) < s - pad).astype(np.float32)[None, None, :, None]
    k, v = k * mask, v * mask
    scale = d**-0.5
    want = np.asarray(
        _ref_attention(q, k[:, :, : s - pad], v[:, :, : s - pad], scale))
    got = flash_attention_exp2_t_pv8(
        q, k, v, kv_pad=pad, sm_scale=scale, block_q=128, block_k=128,
        interpret=True)
    got = np.asarray(jnp.swapaxes(got, 2, 3)).astype(np.float32)
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 3e-2, err.mean()
    assert np.abs(got - want).max() < 5e-2
    assert np.all(np.isfinite(got))


def test_pv8_dispatch_path(rng):
    """The attention.py dispatch pads, calls the kernel, and un-transposes."""
    from trajectorycrafter_tpu.ops.attention import multi_head_attention

    b, s, h, d = 1, 200, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    want = np.asarray(multi_head_attention(q, k, v, impl="xla"))
    import unittest.mock as mock

    from trajectorycrafter_tpu.ops.pallas import flash_pv8

    orig = flash_pv8.flash_attention_exp2_t_pv8

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(flash_pv8, "flash_attention_exp2_t_pv8", interp):
        got = np.asarray(multi_head_attention(q, k, v, impl="flash_pv8"))
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert got.shape == want.shape
    assert err.mean() < 3e-2, err.mean()


def test_pv8_pad_does_not_contaminate_block_max(rng):
    """Zero-padded K rows score exactly 0; when every real score is negative
    they must not win the per-query block max (which would crush real keys'
    p8 to zero and return an all-zeros output)."""
    from trajectorycrafter_tpu.ops.pallas.flash_pv8 import (
        flash_attention_exp2_t_pv8,
    )

    b, h, s, d, pad = 1, 1, 256, 64, 40
    u = np.ones(d, np.float32) / 8.0  # |u|^2 == 1
    q = np.broadcast_to(u, (b, h, s, d)) + 0.01 * rng.standard_normal(
        (b, h, s, d)).astype(np.float32)
    k = np.broadcast_to(-80.0 * u, (b, h, s, d)) + 0.01 * rng.standard_normal(
        (b, h, s, d)).astype(np.float32)  # all real scores ~ -10 (post-scale)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    mask = (np.arange(s) < s - pad).astype(np.float32)[None, None, :, None]
    k, v = jnp.asarray(k * mask), jnp.asarray(v * mask)
    q = jnp.asarray(q)
    scale = d**-0.5
    want = np.asarray(
        _ref_attention(q, k[:, :, : s - pad], v[:, :, : s - pad], scale))
    got = flash_attention_exp2_t_pv8(
        q, k, v, kv_pad=pad, sm_scale=scale, block_q=128, block_k=128,
        interpret=True)
    got = np.asarray(jnp.swapaxes(got, 2, 3)).astype(np.float32)
    assert np.abs(got).max() > 0.01, "all-zeros output: pad won the max"
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 3e-2, err.mean()
