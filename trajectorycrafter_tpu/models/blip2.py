"""BLIP-2 captioner (EVA ViT-g vision encoder + Q-Former + OPT decoder) in
Flax — the last model family the reference loads that previously ran through
a transformers host wrapper.

The reference captions the middle frame once per video
(demo.py:36-39 loads Salesforce/blip2-opt-2.7b in fp16; get_caption at
demo.py:526-536 runs unconditional generate and appends the refine prompt).
This rebuild keeps that contract but runs the whole stack as jit programs:

  * ``Blip2VisionModel``: EVA-CLIP ViT-g/14 — fused-qkv attention with
    separate q/v biases (k bias fixed at zero), pre-LN blocks, learned
    class/position embeddings, post-layernorm;
  * ``Blip2QFormer``: 32 learned query tokens through a BERT-style post-LN
    stack with cross-attention into the image features every
    ``cross_attention_frequency`` layers and a query-path FFN;
  * ``OPTDecoder``: pre-LN causal LM (learned positions with the OPT +2
    offset, ReLU FFN, tied lm head) consuming the projected query tokens as
    a soft prefix;
  * :func:`generate_caption_ids`: greedy decoding as one ``lax.fori_loop``
    over a fixed-length token buffer (prefix 33 tokens + ``max_new_tokens``
    — at this length a KV cache saves nothing on TPU, so the loop re-runs
    the full static-shape forward and stays a single compiled program).

Numerical parity of all three submodules AND whole greedy generations is
asserted against transformers' own Blip2ForConditionalGeneration at tiny
scale in tests/test_blip2.py (converter: utils/convert.convert_blip2).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# image preprocessing constants (transformers Blip2Processor / CLIP stats)
BLIP_IMAGE_SIZE = 224
BLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
BLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class Blip2Config:
    # vision (EVA ViT-g/14)
    vision_hidden: int = 1408
    vision_intermediate: int = 6144
    vision_layers: int = 39
    vision_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    # Q-Former
    num_query_tokens: int = 32
    qformer_hidden: int = 768
    qformer_layers: int = 12
    qformer_heads: int = 12
    qformer_intermediate: int = 3072
    cross_attention_frequency: int = 2
    # OPT decoder (opt-2.7b)
    vocab_size: int = 50272
    opt_hidden: int = 2560
    opt_layers: int = 32
    opt_heads: int = 32
    opt_ffn: int = 10240
    max_positions: int = 2048
    bos_token_id: int = 2
    eos_token_id: int = 50118  # "\n" — blip2-opt's generation stopper


def blip2_opt_2p7b_config() -> Blip2Config:
    return Blip2Config()


def blip2_config_from_hf(cfg: dict) -> Blip2Config:
    """HF Blip2Config dict (checkpoint config.json) -> Blip2Config."""
    v = cfg.get("vision_config", {})
    q = cfg.get("qformer_config", {})
    t = cfg.get("text_config", {})
    d = Blip2Config()
    return Blip2Config(
        vision_hidden=v.get("hidden_size", d.vision_hidden),
        vision_intermediate=v.get("intermediate_size", d.vision_intermediate),
        vision_layers=v.get("num_hidden_layers", d.vision_layers),
        vision_heads=v.get("num_attention_heads", d.vision_heads),
        image_size=v.get("image_size", d.image_size),
        patch_size=v.get("patch_size", d.patch_size),
        num_query_tokens=cfg.get("num_query_tokens", d.num_query_tokens),
        qformer_hidden=q.get("hidden_size", d.qformer_hidden),
        qformer_layers=q.get("num_hidden_layers", d.qformer_layers),
        qformer_heads=q.get("num_attention_heads", d.qformer_heads),
        qformer_intermediate=q.get("intermediate_size", d.qformer_intermediate),
        cross_attention_frequency=q.get("cross_attention_frequency",
                                        d.cross_attention_frequency),
        vocab_size=t.get("vocab_size", d.vocab_size),
        opt_hidden=t.get("hidden_size", d.opt_hidden),
        opt_layers=t.get("num_hidden_layers", d.opt_layers),
        opt_heads=t.get("num_attention_heads", d.opt_heads),
        opt_ffn=t.get("ffn_dim", d.opt_ffn),
        max_positions=t.get("max_position_embeddings", d.max_positions),
        bos_token_id=t.get("bos_token_id", d.bos_token_id),
        # the published blip2-opt generation config stops at "\n" (50118),
        # not the OPT eos in text_config; callers may override via
        # generation_config.json
        eos_token_id=d.eos_token_id,
    )


# ---------------------------------------------------------------------------
# vision encoder
# ---------------------------------------------------------------------------


class Blip2VisionAttention(nn.Module):
    """Fused-qkv attention (HF Blip2Attention: one qkv Linear whose bias is
    the merged [q_bias ; zeros ; v_bias] — serialized as qkv.weight/bias)."""

    cfg: Blip2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, s, d = x.shape
        nh = c.vision_heads
        hd = d // nh
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, nh, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="projection")(out)


class Blip2VisionModel(nn.Module):
    """(B, 224, 224, 3) CLIP-normalised -> (B, 1+hw, vision_hidden)."""

    cfg: Blip2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        b = pixels.shape[0]
        d = c.vision_hidden
        grid = c.image_size // c.patch_size
        patches = nn.Conv(d, kernel_size=(c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size), padding="VALID",
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="patch_embedding")(pixels)
        patches = patches.reshape(b, grid * grid, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, d), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, d)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, grid * grid + 1, d), self.param_dtype)
        x = x + pos.astype(self.dtype)

        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        for i in range(c.vision_layers):
            h = ln(f"layers_{i}_layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
            x = x + Blip2VisionAttention(c, self.dtype, self.param_dtype,
                                         name=f"layers_{i}_self_attn")(h)
            h = ln(f"layers_{i}_layer_norm2")(x.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(c.vision_intermediate, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"layers_{i}_fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"layers_{i}_fc2")(h)
            x = x + h
        return ln("post_layernorm")(x.astype(jnp.float32)).astype(self.dtype)


# ---------------------------------------------------------------------------
# Q-Former
# ---------------------------------------------------------------------------


class QFormerAttention(nn.Module):
    """BERT-style attention + post-LN output block (HF Blip2QFormerAttention:
    self.attention query/key/value, self.output dense + LayerNorm)."""

    cfg: Blip2Config
    kv_dim: int  # qformer_hidden (self) or vision_hidden (cross)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv):
        c = self.cfg
        b, s, d = x.shape
        nh = c.qformer_heads
        hd = d // nh
        dense = lambda n, f=d: nn.Dense(f, dtype=self.dtype,
                                        param_dtype=self.param_dtype, name=n)
        q = dense("query")(x).reshape(b, s, nh, hd)
        k = dense("key")(kv).reshape(b, -1, nh, hd)
        v = dense("value")(kv).reshape(b, -1, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)
        out = dense("out")(ctx)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name="output_norm")(
            (out + x).astype(jnp.float32)).astype(self.dtype)


class Blip2QFormer(nn.Module):
    """Learned query tokens attending to the frozen image features
    -> (B, num_query_tokens, qformer_hidden)."""

    cfg: Blip2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        c = self.cfg
        b = image_embeds.shape[0]
        query = self.param("query_tokens", nn.initializers.normal(0.02),
                           (1, c.num_query_tokens, c.qformer_hidden),
                           self.param_dtype)
        x = jnp.broadcast_to(query.astype(self.dtype),
                             (b, c.num_query_tokens, c.qformer_hidden))
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="layernorm")(
            x.astype(jnp.float32)).astype(self.dtype)
        for i in range(c.qformer_layers):
            x = QFormerAttention(c, c.qformer_hidden, self.dtype,
                                 self.param_dtype,
                                 name=f"layer_{i}_attention")(x, x)
            if i % c.cross_attention_frequency == 0:
                x = QFormerAttention(c, c.vision_hidden, self.dtype,
                                     self.param_dtype,
                                     name=f"layer_{i}_crossattention")(
                    x, image_embeds)
            h = nn.Dense(c.qformer_intermediate, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"layer_{i}_intermediate_query")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(c.qformer_hidden, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"layer_{i}_output_query")(h)
            x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                             param_dtype=self.param_dtype,
                             name=f"layer_{i}_output_query_norm")(
                (h + x).astype(jnp.float32)).astype(self.dtype)
        return x


# ---------------------------------------------------------------------------
# OPT decoder
# ---------------------------------------------------------------------------


class OPTDecoder(nn.Module):
    """Pre-LN OPT causal LM over a fixed-length embedding buffer.

    ``__call__(embeds, valid_len)`` -> hidden states (B, L, opt_hidden):
    positions past ``valid_len`` are masked out of every attention so the
    fixed buffer can carry yet-unfilled slots during generation.  The token
    embedding / tied lm head lives on :class:`Blip2Captioner`.
    """

    cfg: Blip2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embeds, valid_len):
        c = self.cfg
        b, l, d = embeds.shape
        nh = c.opt_heads
        hd = d // nh
        # OPT learned positions with the historical +2 offset
        pos_table = self.param("embed_positions", nn.initializers.normal(0.02),
                               (c.max_positions + 2, d), self.param_dtype)
        x = embeds + pos_table[2 : l + 2].astype(self.dtype)[None]

        idx = jnp.arange(l)
        causal = idx[None, :] <= idx[:, None]
        valid = idx[None, :] < valid_len
        mask = jnp.where(causal & valid, 0.0, -1e9).astype(jnp.float32)

        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        for i in range(c.opt_layers):
            h = ln(f"layers_{i}_self_attn_layer_norm")(
                x.astype(jnp.float32)).astype(self.dtype)
            dense = lambda n, f=d: nn.Dense(f, dtype=self.dtype,
                                            param_dtype=self.param_dtype,
                                            name=f"layers_{i}_{n}")
            q = dense("q_proj")(h).reshape(b, l, nh, hd)
            k = dense("k_proj")(h).reshape(b, l, nh, hd)
            v = dense("v_proj")(h).reshape(b, l, nh, hd)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * hd**-0.5
            w = jax.nn.softmax(scores + mask[None, None], axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, l, d)
            x = x + dense("out_proj")(attn)
            h = ln(f"layers_{i}_final_layer_norm")(
                x.astype(jnp.float32)).astype(self.dtype)
            h = dense("fc1", c.opt_ffn)(h)
            h = jax.nn.relu(h)
            x = x + dense("fc2")(h)
        return ln("final_layer_norm")(x.astype(jnp.float32)).astype(self.dtype)


class Blip2Captioner(nn.Module):
    """vision -> qformer -> language projection; exposes the pieces the
    generation loop needs."""

    cfg: Blip2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.vision_model = Blip2VisionModel(c, self.dtype, self.param_dtype)
        self.qformer = Blip2QFormer(c, self.dtype, self.param_dtype)
        self.language_projection = nn.Dense(c.opt_hidden, dtype=self.dtype,
                                            param_dtype=self.param_dtype)
        self.language_model = OPTDecoder(c, self.dtype, self.param_dtype)
        self.token_embed = nn.Embed(c.vocab_size, c.opt_hidden,
                                    param_dtype=self.param_dtype,
                                    name="embed_tokens")

    def prefix_embeds(self, pixels):
        """(B, H, W, 3) -> (B, num_query_tokens + 1, opt_hidden): projected
        query outputs + BOS embedding (the generate() prompt)."""
        image_embeds = self.vision_model(pixels)
        query_out = self.qformer(image_embeds)
        proj = self.language_projection(query_out)
        bos = self.embed_tokens(
            jnp.full((pixels.shape[0], 1), self.cfg.bos_token_id, jnp.int32))
        return jnp.concatenate([proj, bos], axis=1)

    def decode_step(self, embeds, valid_len):
        hidden = self.language_model(embeds, valid_len)
        return self.token_embed.attend(hidden.astype(self.token_embed.dtype))

    def embed_tokens(self, ids):
        return self.token_embed(ids).astype(self.dtype)

    def __call__(self, pixels):  # init path
        prefix = self.prefix_embeds(pixels)
        return self.decode_step(prefix, prefix.shape[1])


@partial(jax.jit, static_argnames=("model", "max_new_tokens", "eos_token_id"))
def generate_caption_ids(model: Blip2Captioner, params, pixels,
                         max_new_tokens: int = 20,
                         eos_token_id: int | None = None) -> jnp.ndarray:
    """Greedy caption ids (B, max_new_tokens); eos is propagated so trailing
    slots repeat eos (matching transformers' greedy stop semantics).
    ``eos_token_id``: override the config's (pass -1 to disable stopping)."""
    cfg = model.cfg
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    prefix = model.apply({"params": params}, pixels,
                         method=Blip2Captioner.prefix_embeds)
    b, p, d = prefix.shape
    l = p + max_new_tokens
    buf = jnp.zeros((b, l, d), prefix.dtype).at[:, :p].set(prefix)
    ids = jnp.zeros((b, max_new_tokens), jnp.int32)
    done = jnp.zeros((b,), bool)

    def step(i, carry):
        buf, ids, done = carry
        logits = model.apply({"params": params}, buf, p + i,
                             method=Blip2Captioner.decode_step)
        nxt = jnp.argmax(logits[:, p + i - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        done = done | (nxt == eos)
        emb = model.apply({"params": params}, nxt[:, None],
                          method=Blip2Captioner.embed_tokens)[:, 0]
        buf = buf.at[:, p + i].set(emb)
        ids = ids.at[:, i].set(nxt)
        return buf, ids, done

    _, ids, _ = jax.lax.fori_loop(0, max_new_tokens, step, (buf, ids, done))
    return ids


def preprocess_frame(frame01, image_size: int = BLIP_IMAGE_SIZE) -> jnp.ndarray:
    """[0,1] RGB (H, W, 3) -> (1, S, S, 3) CLIP-normalised (bicubic resize,
    the Blip2Processor default)."""
    x = jnp.asarray(frame01, jnp.float32)
    x = jax.image.resize(x, (image_size, image_size, 3), "bicubic")
    x = (x - jnp.asarray(BLIP_IMAGE_MEAN)) / jnp.asarray(BLIP_IMAGE_STD)
    return x[None]
