"""CrossTransformer3D: dual-stream CogVideoX DiT with reference-view
Perceiver cross-attention, in Flax.

TPU-native rebuild of /root/reference/models/crosstransformer3d.py:
  * 42x CogVideoX blocks (AdaLN-Zero, joint text+video self-attention with
    per-head QK layernorm and 3D RoPE on the video tokens, gated FF), with a
    PerceiverCrossAttention over reference-view tokens every
    ``cross_attn_interval`` blocks (reference :831-838);
  * patch embedding of the 33-channel (16 noise + 1 mask + 16 masked-video)
    latent input (reference :735-737) + text projection;
  * channel-last (B, F, H, W, C) latents, tokens (B, S, D);
  * bf16 matmuls with fp32 softmax/layernorm; attention runs through the
    Pallas flash kernel on TPU (ops/attention.py);
  * positional tables (3D sincos resize / 3D RoPE) precomputed on host per
    static shape -- no device-side trilinear resize per call
    (reference recomputes it every forward, :753-784).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.ops.attention import multi_head_attention
from trajectorycrafter_tpu.ops.posemb import resized_pos_embedding, timestep_embedding
from trajectorycrafter_tpu.ops.rope import apply_rotary_emb


def _constrain(x, *axes):
    """Sharding constraint that is a no-op outside a mesh context.

    The mesh probe is deliberately NOT wrapped in a broad try/except: if the
    jax mesh API changes, this should fail loudly rather than silently turn
    the sp/tp path into a no-op (round-1 review finding).
    """
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.axis_names:
        return x
    if not all(a is None or a in mesh.axis_names for a in axes):
        return x
    return jax.lax.with_sharding_constraint(x, P(*axes))


def _dense_cls(quant: str):
    if quant == "int8":
        from trajectorycrafter_tpu.ops.int8 import Int8Dense

        return Int8Dense
    return nn.Dense


class FeedForward(nn.Module):
    """Linear -> tanh-gelu -> Linear (diffusers 'gelu-approximate').

    Under ``quant="int8"`` the chain runs two XLA int8 GEMMs by default
    (measured fastest on-chip, bench_int8.py: 35.1 ms vs 35.4 fused-Pallas
    vs 52.9 bf16 at the production shape).  ``TRAJCRAFTER_INT8_IMPL=pallas``
    opts into the fused Pallas pair (ops/pallas/int8_matmul.py
    int8_ff_apply): GEMM1's epilogue applies bias+gelu and group-requantizes
    to int8 in-VMEM, GEMM2 dequantizes per K-group while accumulating -- the
    (tokens, 4*dim) intermediate never touches HBM in bf16.  Param tree is
    identical to the per-layer Int8Dense path (proj_in/proj_out x
    kernel_q/scale/bias).
    """

    dim: int
    mult: int = 4
    quant: str = "none"
    fuse: Optional[bool] = None  # None = auto (fused when pallas applies)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            from trajectorycrafter_tpu.ops.int8 import (
                Int8DenseParams, int8_dense_forward, pallas_int8_ok)

            inner = self.dim * self.mult
            kq1, s1, b1 = Int8DenseParams(
                inner, x.shape[-1], param_dtype=self.param_dtype,
                name="proj_in")()
            kq2, s2, b2 = Int8DenseParams(
                self.dim, inner, param_dtype=self.param_dtype,
                name="proj_out")()
            use_pallas = pallas_int8_ok(x.shape[-1], self.dim)
            fuse = use_pallas if self.fuse is None else self.fuse
            if fuse:
                from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
                    int8_ff_apply)
                return int8_ff_apply(x, kq1, s1, b1, kq2, s2, b2,
                                     out_dtype=self.dtype)
            h = int8_dense_forward(x, kq1, s1, bias=b1, dtype=self.dtype,
                                   use_pallas=use_pallas)
            h = nn.gelu(h, approximate=True)
            return int8_dense_forward(h, kq2, s2, bias=b2, dtype=self.dtype,
                                      use_pallas=use_pallas)
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj_in")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj_out")(h)


class LayerNormZero(nn.Module):
    """CogVideoX AdaLN-Zero: temb -> 6 modulation vectors; one shared LN
    modulates both streams (reference uses diffusers CogVideoXLayerNormZero)."""

    dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, temb):
        mod = nn.Dense(6 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        shift, scale, gate, enc_shift, enc_scale, enc_gate = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name="norm")
        h = norm(hidden.astype(jnp.float32)).astype(hidden.dtype)
        e = norm(encoder.astype(jnp.float32)).astype(encoder.dtype)
        h = h * (1 + scale[:, None]) + shift[:, None]
        e = e * (1 + enc_scale[:, None]) + enc_shift[:, None]
        return h, e, gate[:, None], enc_gate[:, None]


class JointAttention(nn.Module):
    """Self-attention over [text ; video] tokens with QK layernorm and RoPE
    applied to the video part only (diffusers CogVideoXAttnProcessor2_0)."""

    heads: int
    head_dim: int
    qk_norm: bool = True
    attention_impl: str = "auto"
    quant: str = "none"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, rope: Optional[Tuple]):
        text_len = encoder.shape[1]
        x = jnp.concatenate([encoder, hidden], axis=1)
        b, s, _ = x.shape
        inner = self.heads * self.head_dim
        # q/k/v as three Denses (separate checkpoint tensors) -- XLA fuses the
        # three GEMMs sharing the same input into one pass over x
        dense = lambda name: _dense_cls(self.quant)(
            inner, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(x).reshape(b, s, self.heads, self.head_dim)
        k = dense("to_k")(x).reshape(b, s, self.heads, self.head_dim)
        v = dense("to_v")(x).reshape(b, s, self.heads, self.head_dim)

        if self.qk_norm:
            qn = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="norm_q")
            kn = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="norm_k")
            q = qn(q.astype(jnp.float32)).astype(self.dtype)
            k = kn(k.astype(jnp.float32)).astype(self.dtype)

        if rope is not None:
            cos, sin = rope
            # rotate the video tokens in (B, S, H, D) layout -- no transposes,
            # so the fp32 rotation fuses into the bf16 cast without
            # materialising layout copies (matters at 30k tokens x 48 heads)
            q_img = apply_rotary_emb(q[:, text_len:], cos[:, None, :], sin[:, None, :])
            k_img = apply_rotary_emb(k[:, text_len:], cos[:, None, :], sin[:, None, :])
            q = jnp.concatenate([q[:, :text_len], q_img], axis=1)
            k = jnp.concatenate([k[:, :text_len], k_img], axis=1)

        out = multi_head_attention(q, k, v, impl=self.attention_impl)
        out = _dense_cls(self.quant)(inner, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="to_out")(out)
        return out[:, text_len:], out[:, :text_len]


class CogVideoXBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    attention_impl: str = "auto"
    quant: str = "none"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder, temb, rope):
        norm1 = LayerNormZero(self.dim, self.dtype, self.param_dtype, name="norm1")
        h, e, gate, enc_gate = norm1(hidden, encoder, temb)
        attn_h, attn_e = JointAttention(
            self.heads, self.head_dim, attention_impl=self.attention_impl,
            quant=self.quant, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn1")(h, e, rope)
        hidden = hidden + gate * attn_h
        encoder = encoder + enc_gate * attn_e

        norm2 = LayerNormZero(self.dim, self.dtype, self.param_dtype, name="norm2")
        h, e, gate_ff, enc_gate_ff = norm2(hidden, encoder, temb)
        ff_out = FeedForward(self.dim, quant=self.quant, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="ff")(jnp.concatenate([e, h], axis=1))
        text_len = encoder.shape[1]
        hidden = hidden + gate_ff * ff_out[:, text_len:]
        encoder = encoder + enc_gate_ff * ff_out[:, :text_len]
        return hidden, encoder


class PerceiverCrossAttention(nn.Module):
    """Video tokens query reference-view tokens (reference :287-398).

    Dual-sqrt scaling ((q*s)(k*s)^T with s = dim_head^-1/4) and softmax in
    fp32, matching the reference autocast semantics.
    """

    dim: int = 3072
    head_dim: int = 128
    heads: int = 16
    attention_impl: str = "auto"
    quant: str = "none"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        dense = _dense_cls(self.quant)
        # x: (B, S_ref, dim) reference tokens; latents: (B, S_vid, dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        lat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=self.param_dtype, name="norm2")(
            latents.astype(jnp.float32)).astype(self.dtype)
        b, s_vid, _ = lat.shape
        inner = self.heads * self.head_dim
        # q/out run over the full video-token stream (~30k tokens) -- the
        # quantizable GEMMs; kv sees only the short replicated ref tokens
        # but shares the int8 path for a uniform param tree under quant
        q = dense(inner, use_bias=False, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="to_q")(lat)
        kv = dense(2 * inner, use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, s_vid, self.heads, self.head_dim)
        k = k.reshape(b, -1, self.heads, self.head_dim)
        v = v.reshape(b, -1, self.heads, self.head_dim)
        # the reference-token kv is short and replicated -- never ring-shard it
        impl = "xla" if self.attention_impl == "ring" else self.attention_impl
        out = multi_head_attention(q, k, v, scale=self.head_dim**-0.5, impl=impl)
        return dense(self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_out")(out)


class CrossTransformer3DModel(nn.Module):
    """Deployed TrajectoryCrafter scale by default: 42 blocks, dim 3072."""

    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 33
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 42
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    patch_size: int = 2
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = True
    add_noise_in_inpaint_model: bool = True
    is_train_cross: bool = True
    cross_attn_interval: int = 2
    cross_attn_dim_head: int = 128
    cross_attn_num_heads: int = 16
    attention_impl: str = "auto"
    quant: str = "none"  # "int8": block attn/FF GEMMs on the int8 MXU path
    remat: bool = False
    shard_activations: bool = False  # dp x sp constraints on the token stream
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, F, H, W, 16) noisy latents
        encoder_hidden_states: jnp.ndarray,  # (B, 226, 4096) text
        timestep: jnp.ndarray,  # (B,)
        inpaint_latents: Optional[jnp.ndarray] = None,  # (B, F, H, W, 17)
        cross_latents: Optional[jnp.ndarray] = None,  # (B, F_ref, H, W, 16)
        image_rotary_emb: Optional[Tuple] = None,  # (cos, sin) host tables
    ) -> jnp.ndarray:
        b, f, h, w, _ = hidden_states.shape
        p = self.patch_size
        dim = self.inner_dim

        # 1. time embedding (fp32 sinusoid -> bf16 MLP, reference :724-732)
        t_freq = timestep_embedding(timestep, dim).astype(self.dtype)
        temb = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="time_embedding_linear_1")(t_freq)
        temb = nn.silu(temb)
        temb = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="time_embedding_linear_2")(temb)

        # 2. patch embedding of [noise ; inpaint] (reference :735-737)
        if inpaint_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, inpaint_latents], axis=-1)
        x = hidden_states.reshape(b * f, h, w, hidden_states.shape[-1])
        x = nn.Conv(dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed_proj")(x)
        video_tokens = x.reshape(b, f * (h // p) * (w // p), dim)
        text_tokens = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                               name="patch_embed_text_proj")(encoder_hidden_states)

        # reference-view branch
        cross_tokens = None
        if self.is_train_cross and cross_latents is not None:
            fr = cross_latents.shape[1]
            cx = cross_latents.reshape(b * fr, h, w, cross_latents.shape[-1])
            cx = nn.Conv(dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="ref_patch_embed_proj")(cx)
            cross_tokens = cx.reshape(b, fr * (h // p) * (w // p), dim)

        # 3. positional embedding (non-RoPE checkpoints; reference :751-784)
        text_len = text_tokens.shape[1]
        if not self.use_rotary_positional_embeddings:
            table = resized_pos_embedding(
                dim,
                (self.sample_frames - 1) // self.temporal_compression_ratio + 1,
                self.sample_height // p,
                self.sample_width // p,
                f, h // p, w // p,
                self.spatial_interpolation_scale,
                self.temporal_interpolation_scale,
            )
            video_tokens = video_tokens + jnp.asarray(table, self.dtype)[None]

        hidden, encoder = video_tokens, text_tokens
        if self.shard_activations:
            # video tokens sharded over the sequence axis; text replicated.
            # XLA inserts the all-gathers attention needs (kv gathered over sp).
            hidden = _constrain(hidden, "dp", "sp", None)
            encoder = _constrain(encoder, "dp", None, None)

        # 4. transformer blocks with interleaved Perceiver cross-attention
        block_cls = CogVideoXBlock
        if self.remat:
            block_cls = nn.remat(CogVideoXBlock, static_argnums=())
        ca_idx = 0
        for i in range(self.num_layers):
            hidden, encoder = block_cls(
                dim, self.num_attention_heads, self.attention_head_dim,
                attention_impl=self.attention_impl, quant=self.quant,
                dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(hidden, encoder, temb, image_rotary_emb)
            if cross_tokens is not None and i % self.cross_attn_interval == 0:
                hidden = hidden + PerceiverCrossAttention(
                    dim, self.cross_attn_dim_head, self.cross_attn_num_heads,
                    attention_impl=self.attention_impl, quant=self.quant,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"perceiver_cross_attention_{ca_idx}",
                )(cross_tokens, hidden)
                ca_idx += 1

        # 5. final norm + AdaLN + projection (reference :848-857)
        # NOTE: norm_final is applied to the CONCATENATED text+video stream,
        # matching the deployed RoPE (CogVideoX-5B-style) checkpoint; the
        # upstream 2B branch (reference :843-846, commented out there too)
        # norms only the video tokens -- port that branch before loading a
        # non-RoPE checkpoint.
        joint = jnp.concatenate([encoder, hidden], axis=1)
        joint = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="norm_final")(
            joint.astype(jnp.float32)).astype(self.dtype)
        hidden = joint[:, text_len:]

        mod = nn.Dense(2 * dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        hidden = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="norm_out_norm")(
            hidden.astype(jnp.float32)).astype(self.dtype)
        hidden = hidden * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(p * p * self.out_channels, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj_out")(hidden)

        # 6. unpatchify -> (B, F, H, W, out_channels), matching the reference's
        #    [c][i][j] ordering of the projection units (reference :863-867)
        out = out.reshape(b, f, h // p, w // p, self.out_channels, p, p)
        out = out.transpose(0, 1, 2, 5, 3, 6, 4)  # (b, f, h/p, p, w/p, p, c)
        return out.reshape(b, f, h, w, self.out_channels)
