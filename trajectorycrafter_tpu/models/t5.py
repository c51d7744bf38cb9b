"""T5 v1.1 text encoder in Flax (the CogVideoX prompt encoder).

The reference loads ``T5EncoderModel`` from the CogVideoX-Fun checkpoint
(demo.py:643-645; XXL scale: d_model 4096, 24 layers, 64 heads, d_ff 10240,
gated-gelu).  This is a from-scratch Flax implementation: RMS layernorms,
relative position bias on the first block shared across layers, no biases in
projections, gated-gelu feed-forward.

Weight conversion from the HF torch checkpoint lives in utils/convert.py and
is parity-tested against ``transformers`` (torch CPU) in tests/test_t5.py.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class T5Config:
    def __init__(
        self,
        vocab_size: int = 32128,
        d_model: int = 4096,
        d_kv: int = 64,
        d_ff: int = 10240,
        num_layers: int = 24,
        num_heads: int = 64,
        relative_attention_num_buckets: int = 32,
        relative_attention_max_distance: int = 128,
        layer_norm_epsilon: float = 1e-6,
    ):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.d_kv = d_kv
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        self.layer_norm_epsilon = layer_norm_epsilon


def t5_xxl_config() -> T5Config:
    return T5Config()


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (x * w.astype(jnp.float32)).astype(self.dtype)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket mapping (half for sign, log-scale tail)."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        b, s, _ = x.shape
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("q")(x).reshape(b, s, c.num_heads, c.d_kv)
        k = dense("k")(x).reshape(b, s, c.num_heads, c.d_kv)
        v = dense("v")(x).reshape(b, s, c.num_heads, c.d_kv)

        if self.has_relative_bias:
            rel = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads),
                self.param_dtype,
            )
            pos = np.arange(s)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None],
                c.relative_attention_num_buckets,
                c.relative_attention_max_distance,
            )
            position_bias = jnp.transpose(rel[jnp.asarray(buckets)], (2, 0, 1))[None]

        # T5 omits the 1/sqrt(d) scale (folded into initialisation)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias.astype(jnp.float32)
        if mask is not None:
            scores = scores + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, inner)
        out = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        h = RMSNorm(c.layer_norm_epsilon, self.dtype, self.param_dtype,
                    name="attn_layer_norm")(x)
        attn_out, position_bias = T5Attention(
            c, self.has_relative_bias, self.dtype, self.param_dtype, name="attention"
        )(h, mask, position_bias)
        x = x + attn_out

        h = RMSNorm(c.layer_norm_epsilon, self.dtype, self.param_dtype,
                    name="ff_layer_norm")(x)
        wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="wi_0")(h)
        wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="wo")(h)
        return x + h, position_bias


class T5EncoderModel(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        emb = self.param("shared_embedding", nn.initializers.normal(1.0),
                         (c.vocab_size, c.d_model), self.param_dtype)
        x = emb[input_ids].astype(self.dtype)
        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"block_{i}",
            )(x, attention_mask, position_bias)
        x = RMSNorm(c.layer_norm_epsilon, self.dtype, self.param_dtype,
                    name="final_layer_norm")(x)
        return x
