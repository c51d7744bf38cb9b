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
