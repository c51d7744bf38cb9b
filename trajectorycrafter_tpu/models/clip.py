"""CLIP vision encoder with projection (Flax).

SVD/DepthCrafter condition the video UNet on CLIP image embeddings
(reference models/infer.py:26-31 loads the SVD pipeline shell whose
image_encoder is CLIP ViT-H/14 with a 1024-d projection).  Parity-tested
against transformers' torch CLIPVisionModelWithProjection.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class CLIPVisionConfig:
    def __init__(
        self,
        hidden_size: int = 1280,
        intermediate_size: int = 5120,
        num_hidden_layers: int = 32,
        num_attention_heads: int = 16,
        image_size: int = 224,
        patch_size: int = 14,
        projection_dim: int = 1024,
        layer_norm_eps: float = 1e-5,
    ):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.image_size = image_size
        self.patch_size = patch_size
        self.projection_dim = projection_dim
        self.layer_norm_eps = layer_norm_eps


def clip_vit_h14_config() -> CLIPVisionConfig:
    return CLIPVisionConfig()


# image normalisation used by the CLIP processor (OpenAI statistics)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPMLP(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        h = nn.sigmoid(1.702 * h) * h  # quick-gelu
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, s, _ = x.shape
        hd = c.hidden_size // c.num_attention_heads
        dense = lambda n: nn.Dense(c.hidden_size, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        q = dense("q_proj")(x).reshape(b, s, c.num_attention_heads, hd)
        k = dense("k_proj")(x).reshape(b, s, c.num_attention_heads, hd)
        v = dense("v_proj")(x).reshape(b, s, c.num_attention_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, c.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        eps = self.cfg.layer_norm_eps
        h = nn.LayerNorm(epsilon=eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="layer_norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = x + CLIPAttention(self.cfg, self.dtype, self.param_dtype,
                              name="self_attn")(h)
        h = nn.LayerNorm(epsilon=eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="layer_norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        return x + CLIPMLP(self.cfg, self.dtype, self.param_dtype, name="mlp")(h)


class CLIPVisionModelWithProjection(nn.Module):
    """(B, H, W, 3) normalised pixels -> image_embeds (B, projection_dim)."""

    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b = pixels.shape[0]
        patches = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID", use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embedding",
        )(pixels)
        patches = patches.reshape(b, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size)), patches],
            axis=1,
        )
        npos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (npos, c.hidden_size), self.param_dtype)
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="pre_layrnorm")(
            x.astype(jnp.float32)).astype(self.dtype)
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(c, self.dtype, self.param_dtype, name=f"layers_{i}")(x)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="post_layernorm")(
            pooled.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="visual_projection")(pooled)
