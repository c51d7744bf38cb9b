"""HF torch checkpoint -> Flax param tree converters.

One-time converters for the model zoo the reference loads
(SURVEY.md section 1: TrajectoryCrafter DiT, CogVideoX-Fun VAE + T5,
DepthCrafter UNet + SVD shell).  Input is a flat torch state dict
(e.g. from ``safetensors.numpy.load_file`` -- no torch required at runtime);
output is the nested param dict our Flax modules expect.

Layout rules:
  torch Linear weight (out, in)        -> kernel (in, out)          [transpose]
  torch Conv2d weight (O, I, kh, kw)   -> kernel (kh, kw, I, O)
  torch Conv3d weight (O, I, kt, kh, kw) -> kernel (kt, kh, kw, I, O)
  torch LayerNorm weight/bias          -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


Array = np.ndarray


def _lin(sd: Mapping[str, Array], prefix: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    out = {}
    if prefix + ".weight" in sd:
        out["scale"] = np.asarray(sd[prefix + ".weight"])
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _gn(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _conv2d(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    w = np.asarray(sd[prefix + ".weight"])  # (O, I, kh, kw)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _conv3d(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    w = np.asarray(sd[prefix + ".weight"])  # (O, I, kt, kh, kw)
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


# ----------------------------------------------------------------------------
# T5 encoder (HF transformers T5EncoderModel state dict)
# ----------------------------------------------------------------------------


def convert_t5_encoder(sd: Mapping[str, Array], num_layers: int) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "shared_embedding": np.asarray(sd["shared.weight"]),
        "final_layer_norm": {
            "weight": np.asarray(sd["encoder.final_layer_norm.weight"])
        },
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}.layer"
        attn = {
            "q": _lin(sd, f"{p}.0.SelfAttention.q", bias=False),
            "k": _lin(sd, f"{p}.0.SelfAttention.k", bias=False),
            "v": _lin(sd, f"{p}.0.SelfAttention.v", bias=False),
            "o": _lin(sd, f"{p}.0.SelfAttention.o", bias=False),
        }
        if i == 0:
            attn["relative_attention_bias"] = np.asarray(
                sd[f"{p}.0.SelfAttention.relative_attention_bias.weight"]
            )
        params[f"block_{i}"] = {
            "attention": attn,
            "attn_layer_norm": {"weight": np.asarray(sd[f"{p}.0.layer_norm.weight"])},
            "ff_layer_norm": {"weight": np.asarray(sd[f"{p}.1.layer_norm.weight"])},
            "wi_0": _lin(sd, f"{p}.1.DenseReluDense.wi_0", bias=False),
            "wi_1": _lin(sd, f"{p}.1.DenseReluDense.wi_1", bias=False),
            "wo": _lin(sd, f"{p}.1.DenseReluDense.wo", bias=False),
        }
    return params


# ----------------------------------------------------------------------------
# CogVideoX VAE (reference models/autoencoder_magvit.py param names)
# ----------------------------------------------------------------------------


def _causal_conv(sd, prefix):
    return {"conv": _conv3d(sd, prefix + ".conv")}


def _spatial_norm(sd, prefix):
    return {
        "norm_layer": _gn(sd, prefix + ".norm_layer"),
        "conv_y": _causal_conv(sd, prefix + ".conv_y"),
        "conv_b": _causal_conv(sd, prefix + ".conv_b"),
    }


def _resnet3d(sd, prefix, spatial_norm: bool):
    out = {
        "conv1": _causal_conv(sd, prefix + ".conv1"),
        "conv2": _causal_conv(sd, prefix + ".conv2"),
    }
    if spatial_norm:
        out["norm1"] = _spatial_norm(sd, prefix + ".norm1")
        out["norm2"] = _spatial_norm(sd, prefix + ".norm2")
    else:
        out["norm1"] = _gn(sd, prefix + ".norm1")
        out["norm2"] = _gn(sd, prefix + ".norm2")
    if prefix + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, prefix + ".conv_shortcut")
    return out


def convert_vae(sd: Mapping[str, Array], layers_per_block: int = 3,
                num_blocks: int = 4) -> Dict[str, Any]:
    enc: Dict[str, Any] = {"conv_in": _causal_conv(sd, "encoder.conv_in")}
    for i in range(num_blocks):
        blk = {}
        for j in range(layers_per_block):
            blk[f"resnets_{j}"] = _resnet3d(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", spatial_norm=False
            )
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsamplers_0"] = {
                "conv": _conv2d(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
        enc[f"down_blocks_{i}"] = blk
    enc["mid_block"] = {
        f"resnets_{j}": _resnet3d(sd, f"encoder.mid_block.resnets.{j}", False)
        for j in range(2)
    }
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _causal_conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _causal_conv(sd, "decoder.conv_in")}
    dec["mid_block"] = {
        f"resnets_{j}": _resnet3d(sd, f"decoder.mid_block.resnets.{j}", True)
        for j in range(2)
    }
    for i in range(num_blocks):
        blk = {}
        for j in range(layers_per_block + 1):
            blk[f"resnets_{j}"] = _resnet3d(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", spatial_norm=True
            )
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsamplers_0"] = {
                "conv": _conv2d(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
        dec[f"up_blocks_{i}"] = blk
    dec["norm_out"] = _spatial_norm(sd, "decoder.norm_out")
    dec["conv_out"] = _causal_conv(sd, "decoder.conv_out")
    return {"encoder": enc, "decoder": dec}


# ----------------------------------------------------------------------------
# CrossTransformer3D DiT (reference models/crosstransformer3d.py param names)
# ----------------------------------------------------------------------------


def convert_dit(sd: Mapping[str, Array], num_layers: int = 42,
                cross_attn_interval: int = 2) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "patch_embed_proj": _conv2d(sd, "patch_embed.proj"),
        "patch_embed_text_proj": _lin(sd, "patch_embed.text_proj"),
        "time_embedding_linear_1": _lin(sd, "time_embedding.linear_1"),
        "time_embedding_linear_2": _lin(sd, "time_embedding.linear_2"),
        "norm_final": _ln(sd, "norm_final"),
        "norm_out_linear": _lin(sd, "norm_out.linear"),
        "norm_out_norm": _ln(sd, "norm_out.norm"),
        "proj_out": _lin(sd, "proj_out"),
    }
    if "ref_patch_embed.proj.weight" in sd:
        params["ref_patch_embed_proj"] = _conv2d(sd, "ref_patch_embed.proj")

    for i in range(num_layers):
        p = f"transformer_blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": {"linear": _lin(sd, f"{p}.norm1.linear"),
                      "norm": _ln(sd, f"{p}.norm1.norm")},
            "norm2": {"linear": _lin(sd, f"{p}.norm2.linear"),
                      "norm": _ln(sd, f"{p}.norm2.norm")},
            "attn1": {
                "to_q": _lin(sd, f"{p}.attn1.to_q"),
                "to_k": _lin(sd, f"{p}.attn1.to_k"),
                "to_v": _lin(sd, f"{p}.attn1.to_v"),
                "to_out": _lin(sd, f"{p}.attn1.to_out.0"),
                "norm_q": _ln(sd, f"{p}.attn1.norm_q"),
                "norm_k": _ln(sd, f"{p}.attn1.norm_k"),
            },
            "ff": {
                "proj_in": _lin(sd, f"{p}.ff.net.0.proj"),
                "proj_out": _lin(sd, f"{p}.ff.net.2"),
            },
        }
    n_cross = num_layers // cross_attn_interval
    for i in range(n_cross):
        p = f"perceiver_cross_attention.{i}"
        if p + ".to_q.weight" not in sd:
            continue
        params[f"perceiver_cross_attention_{i}"] = {
            "norm1": _ln(sd, p + ".norm1"),
            "norm2": _ln(sd, p + ".norm2"),
            "to_q": _lin(sd, p + ".to_q", bias=False),
            "to_kv": _lin(sd, p + ".to_kv", bias=False),
            "to_out": _lin(sd, p + ".to_out", bias=False),
        }
    return params


# ----------------------------------------------------------------------------
# SVD / DepthCrafter spatio-temporal UNet (diffusers
# UNetSpatioTemporalConditionModel state dict -> models/depthcrafter.py names)
# ----------------------------------------------------------------------------


def _res2d(sd, prefix):
    out = {
        "norm1": _gn(sd, prefix + ".norm1"),
        "norm2": _gn(sd, prefix + ".norm2"),
        "conv1": _conv2d(sd, prefix + ".conv1"),
        "conv2": _conv2d(sd, prefix + ".conv2"),
    }
    if prefix + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, prefix + ".time_emb_proj")
    if prefix + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv2d(sd, prefix + ".conv_shortcut")
    return out


def _res_temporal(sd, prefix):
    out = {
        "norm1": _gn(sd, prefix + ".norm1"),
        "norm2": _gn(sd, prefix + ".norm2"),
        "conv1": _conv3d(sd, prefix + ".conv1"),
        "conv2": _conv3d(sd, prefix + ".conv2"),
    }
    if prefix + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, prefix + ".time_emb_proj")
    if prefix + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, prefix + ".conv_shortcut")
    return out


def _st_resblock(sd, prefix):
    return {
        "spatial_res_block": _res2d(sd, prefix + ".spatial_res_block"),
        "temporal_res_block": _res_temporal(sd, prefix + ".temporal_res_block"),
        "time_mixer": {"mix_factor": np.atleast_1d(
            np.asarray(sd[prefix + ".time_mixer.mix_factor"]))},
    }


def _attn_inner(sd, prefix):
    out = {
        "to_q": _lin(sd, prefix + ".to_q", bias=False),
        "to_k": _lin(sd, prefix + ".to_k", bias=False),
        "to_v": _lin(sd, prefix + ".to_v", bias=False),
        "to_out": _lin(sd, prefix + ".to_out.0"),
    }
    return out


def _basic_block(sd, prefix):
    return {
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "norm3": _ln(sd, prefix + ".norm3"),
        "attn1": _attn_inner(sd, prefix + ".attn1"),
        "attn2": _attn_inner(sd, prefix + ".attn2"),
        "ff": {"proj_in": _lin(sd, prefix + ".ff.net.0.proj"),
               "proj_out": _lin(sd, prefix + ".ff.net.2")},
    }


def _temporal_block(sd, prefix):
    return {
        "norm_in": _ln(sd, prefix + ".norm_in"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "norm3": _ln(sd, prefix + ".norm3"),
        "ff_in": {"proj_in": _lin(sd, prefix + ".ff_in.net.0.proj"),
                  "proj_out": _lin(sd, prefix + ".ff_in.net.2")},
        "attn1": _attn_inner(sd, prefix + ".attn1"),
        "attn2": _attn_inner(sd, prefix + ".attn2"),
        "ff": {"proj_in": _lin(sd, prefix + ".ff.net.0.proj"),
               "proj_out": _lin(sd, prefix + ".ff.net.2")},
    }


def _st_transformer(sd, prefix, num_layers=1):
    out = {
        "norm": _gn(sd, prefix + ".norm"),
        "proj_in": _lin(sd, prefix + ".proj_in"),
        "proj_out": _lin(sd, prefix + ".proj_out"),
        "time_pos_embed_linear_1": _lin(sd, prefix + ".time_pos_embed.linear_1"),
        "time_pos_embed_linear_2": _lin(sd, prefix + ".time_pos_embed.linear_2"),
        "time_mixer": {"mix_factor": np.atleast_1d(
            np.asarray(sd[prefix + ".time_mixer.mix_factor"]))},
    }
    for i in range(num_layers):
        out[f"transformer_blocks_{i}"] = _basic_block(
            sd, f"{prefix}.transformer_blocks.{i}")
        out[f"temporal_transformer_blocks_{i}"] = _temporal_block(
            sd, f"{prefix}.temporal_transformer_blocks.{i}")
    return out


def convert_svd_unet(sd: Mapping[str, Array], layers_per_block: int = 2,
                     num_blocks: int = 4) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "conv_in": _conv2d(sd, "conv_in"),
        "conv_out": _conv2d(sd, "conv_out"),
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "time_embedding_linear_1": _lin(sd, "time_embedding.linear_1"),
        "time_embedding_linear_2": _lin(sd, "time_embedding.linear_2"),
        "add_embedding_linear_1": _lin(sd, "add_embedding.linear_1"),
        "add_embedding_linear_2": _lin(sd, "add_embedding.linear_2"),
    }
    for i in range(num_blocks):
        has_attn = i < num_blocks - 1
        for j in range(layers_per_block):
            params[f"down_{i}_res_{j}"] = _st_resblock(
                sd, f"down_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"down_{i}_attn_{j}"] = _st_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}")
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            params[f"down_{i}_downsample"] = _conv2d(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
    params["mid_res_0"] = _st_resblock(sd, "mid_block.resnets.0")
    params["mid_res_1"] = _st_resblock(sd, "mid_block.resnets.1")
    params["mid_attn"] = _st_transformer(sd, "mid_block.attentions.0")
    for i in range(num_blocks):
        block_idx = num_blocks - 1 - i
        has_attn = block_idx < num_blocks - 1
        for j in range(layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _st_resblock(
                sd, f"up_blocks.{i}.resnets.{j}")
            if has_attn:
                params[f"up_{i}_attn_{j}"] = _st_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}")
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            params[f"up_{i}_upsample"] = _conv2d(
                sd, f"up_blocks.{i}.upsamplers.0.conv")
    return params


# ----------------------------------------------------------------------------
# SVD temporal-decoder VAE (diffusers AutoencoderKLTemporalDecoder)
# ----------------------------------------------------------------------------


def _vae_attn(sd, prefix):
    return {
        "group_norm": _gn(sd, prefix + ".group_norm"),
        "to_q": _lin(sd, prefix + ".to_q"),
        "to_k": _lin(sd, prefix + ".to_k"),
        "to_v": _lin(sd, prefix + ".to_v"),
        "to_out": _lin(sd, prefix + ".to_out.0"),
    }


def convert_svd_vae(sd: Mapping[str, Array], layers_per_block: int = 2,
                    num_blocks: int = 4) -> Dict[str, Any]:
    enc: Dict[str, Any] = {
        "conv_in": _conv2d(sd, "encoder.conv_in"),
        "conv_out": _conv2d(sd, "encoder.conv_out"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "quant_conv": _conv2d(sd, "quant_conv"),
        "mid_res_0": _res2d(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _res2d(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _res2d(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = _conv2d(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: Dict[str, Any] = {
        "conv_in": _conv2d(sd, "decoder.conv_in"),
        "conv_out": _conv2d(sd, "decoder.conv_out"),
        "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
        "time_conv_out": _conv3d(sd, "decoder.time_conv_out"),
        "mid_res_0": _st_resblock(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _st_resblock(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
    }
    for i in range(num_blocks):
        for j in range(3):
            dec[f"up_{i}_res_{j}"] = _st_resblock(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = _conv2d(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    return {"encoder": enc, "decoder": dec}


# ----------------------------------------------------------------------------
# CLIP vision encoder (HF transformers CLIPVisionModelWithProjection)
# ----------------------------------------------------------------------------


def convert_clip_vision(sd: Mapping[str, Array], num_layers: int) -> Dict[str, Any]:
    v = "vision_model."
    params: Dict[str, Any] = {
        "class_embedding": np.asarray(sd[v + "embeddings.class_embedding"]),
        "position_embedding": np.asarray(sd[v + "embeddings.position_embedding.weight"]),
        "patch_embedding": {
            "kernel": np.transpose(
                np.asarray(sd[v + "embeddings.patch_embedding.weight"]), (2, 3, 1, 0)
            )
        },
        "pre_layrnorm": _ln(sd, v + "pre_layrnorm"),
        "post_layernorm": _ln(sd, v + "post_layernorm"),
        "visual_projection": _lin(sd, "visual_projection", bias=False),
    }
    for i in range(num_layers):
        p = f"{v}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
            "self_attn": {
                "q_proj": _lin(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2"),
            },
        }
    return params


def _conv_transpose2d(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    # torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose kernel
    # (kh, kw, I, O) with the spatial taps flipped (lax.conv_transpose applies
    # the kernel unflipped; verified numerically against torch).
    w = np.asarray(sd[prefix + ".weight"])
    out = {"kernel": np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def convert_vda(sd: Mapping[str, Array], num_layers: int = 24,
                reassemble_factors=(4.0, 2.0, 1.0, 0.5)) -> Dict[str, Any]:
    """transformers DepthAnythingForDepthEstimation state dict -> flax
    ``models.vda.VideoDepthAnything`` param tree (spatial part; temporal
    blocks, when present, keep our native orbax naming -- the single-image
    HF checkpoints carry none).

    Key layout read from transformers modeling_depth_anything.py /
    modeling_dinov2.py (the reference consumes the same family through the
    non-vendored Video-Depth-Anything checkout, main_alignment.py:108-112).
    """
    bb: Dict[str, Any] = {
        "patch_embeddings": _conv2d(sd, "backbone.embeddings.patch_embeddings.projection"),
        "cls_token": np.asarray(sd["backbone.embeddings.cls_token"]),
        "position_embeddings": np.asarray(sd["backbone.embeddings.position_embeddings"]),
        "layernorm": _ln(sd, "backbone.layernorm"),
    }
    for i in range(num_layers):
        p = f"backbone.encoder.layer.{i}"
        bb[f"layer_{i}"] = {
            "norm1": _ln(sd, p + ".norm1"),
            "attention": {
                "query": _lin(sd, p + ".attention.attention.query"),
                "key": _lin(sd, p + ".attention.attention.key"),
                "value": _lin(sd, p + ".attention.attention.value"),
                "out": _lin(sd, p + ".attention.output.dense"),
            },
            "layer_scale1": np.asarray(sd[p + ".layer_scale1.lambda1"]),
            "norm2": _ln(sd, p + ".norm2"),
            "mlp": {"fc1": _lin(sd, p + ".mlp.fc1"),
                    "fc2": _lin(sd, p + ".mlp.fc2")},
            "layer_scale2": np.asarray(sd[p + ".layer_scale2.lambda1"]),
        }

    head: Dict[str, Any] = {}
    n_stages = len(reassemble_factors)
    for i, factor in enumerate(reassemble_factors):
        p = f"neck.reassemble_stage.layers.{i}"
        head[f"reassemble_{i}_projection"] = _conv2d(sd, p + ".projection")
        if factor > 1:
            head[f"reassemble_{i}_resize"] = _conv_transpose2d(sd, p + ".resize")
        elif factor < 1:
            head[f"reassemble_{i}_resize"] = _conv2d(sd, p + ".resize")
        head[f"neck_conv_{i}"] = _conv2d(sd, f"neck.convs.{i}")
    for i in range(n_stages):
        p = f"neck.fusion_stage.layers.{i}"
        fusion: Dict[str, Any] = {
            "projection": _conv2d(sd, p + ".projection"),
            "residual_layer2": {
                "convolution1": _conv2d(sd, p + ".residual_layer2.convolution1"),
                "convolution2": _conv2d(sd, p + ".residual_layer2.convolution2"),
            },
        }
        if i > 0:
            fusion["residual_layer1"] = {
                "convolution1": _conv2d(sd, p + ".residual_layer1.convolution1"),
                "convolution2": _conv2d(sd, p + ".residual_layer1.convolution2"),
            }
        else:
            # the first (deepest) fusion layer never receives a residual, so
            # our module has no residual_layer1; consume the torch params
            # (initialised but unused there too) to keep the contract exact.
            for q in (".residual_layer1.convolution1", ".residual_layer1.convolution2"):
                _conv2d(sd, p + q)
        head[f"fusion_{i}"] = fusion
    head["head_conv1"] = _conv2d(sd, "head.conv1")
    head["head_conv2"] = _conv2d(sd, "head.conv2")
    head["head_conv3"] = _conv2d(sd, "head.conv3")
    return {"backbone": bb, "head": head}


def _temporal_module(sd: Mapping[str, Array], prefix: str,
                     num_attention_blocks: int = 2) -> Dict[str, Any]:
    """Official VDA motion module (AnimateDiff TemporalModule serialized at
    ``head.motion_modules.{i}.temporal_transformer``) -> flax
    ``models.vda.TemporalModule`` tree."""
    tt = prefix + ".temporal_transformer"
    blk = f"{tt}.transformer_blocks.0"
    blocks_0: Dict[str, Any] = {
        "ff_norm": _ln(sd, blk + ".ff_norm"),
        "ff_proj": _lin(sd, blk + ".ff.net.0.proj"),
        "ff_out": _lin(sd, blk + ".ff.net.2"),
    }
    for k in range(num_attention_blocks):
        a = f"{blk}.attention_blocks.{k}"
        blocks_0[f"norms_{k}"] = _ln(sd, f"{blk}.norms.{k}")
        blocks_0[f"attention_blocks_{k}"] = {
            "to_q": _lin(sd, a + ".to_q", bias=False),
            "to_k": _lin(sd, a + ".to_k", bias=False),
            "to_v": _lin(sd, a + ".to_v", bias=False),
            "to_out": _lin(sd, a + ".to_out.0"),
        }
        # the sinusoidal pos_encoder.pe buffer is value-identical to our
        # static sinusoidal_frame_encoding table -- consume and drop
        if a + ".pos_encoder.pe" in sd:
            np.asarray(sd[a + ".pos_encoder.pe"])
    return {
        "norm": _gn(sd, tt + ".norm"),
        "proj_in": _lin(sd, tt + ".proj_in"),
        "blocks_0": blocks_0,
        "proj_out": _lin(sd, tt + ".proj_out"),
    }


def convert_vda_official(sd: Mapping[str, Array], num_layers: int = 24,
                         reassemble_factors=(4.0, 2.0, 1.0, 0.5),
                         num_temporal_blocks: int = 4) -> Dict[str, Any]:
    """Official Video-Depth-Anything .pth state dict -> flax
    ``models.vda.VideoDepthAnything`` param tree.

    The official checkpoint (video_depth_anything_{vits,vitl}.pth, loaded
    strict=True by the reference at main_alignment.py:108-112) uses the
    torchhub DINOv2 naming for the backbone (``pretrained.blocks.{i}.attn.qkv``
    fused projections, ``ls1.gamma`` LayerScale) and the MiDaS/DPT scratch
    naming for the head (``head.scratch.refinenet{n}`` etc.), plus four
    AnimateDiff motion modules at ``head.motion_modules.{i}`` -- all unlike
    the HF transformers layout convert_vda handles.
    """
    hs = np.asarray(sd["pretrained.cls_token"]).shape[-1]
    bb: Dict[str, Any] = {
        "patch_embeddings": _conv2d(sd, "pretrained.patch_embed.proj"),
        "cls_token": np.asarray(sd["pretrained.cls_token"]),
        "position_embeddings": np.asarray(sd["pretrained.pos_embed"]),
        "layernorm": _ln(sd, "pretrained.norm"),
    }
    if "pretrained.mask_token" in sd:
        np.asarray(sd["pretrained.mask_token"])  # consume-and-drop
    for i in range(num_layers):
        p = f"pretrained.blocks.{i}"
        qkv_w = np.asarray(sd[p + ".attn.qkv.weight"])  # (3C, C)
        qkv_b = np.asarray(sd[p + ".attn.qkv.bias"])
        bb[f"layer_{i}"] = {
            "norm1": _ln(sd, p + ".norm1"),
            "attention": {
                "query": {"kernel": qkv_w[:hs].T, "bias": qkv_b[:hs]},
                "key": {"kernel": qkv_w[hs : 2 * hs].T, "bias": qkv_b[hs : 2 * hs]},
                "value": {"kernel": qkv_w[2 * hs :].T, "bias": qkv_b[2 * hs :]},
                "out": _lin(sd, p + ".attn.proj"),
            },
            "layer_scale1": np.asarray(sd[p + ".ls1.gamma"]),
            "norm2": _ln(sd, p + ".norm2"),
            "mlp": {"fc1": _lin(sd, p + ".mlp.fc1"),
                    "fc2": _lin(sd, p + ".mlp.fc2")},
            "layer_scale2": np.asarray(sd[p + ".ls2.gamma"]),
        }

    head: Dict[str, Any] = {}
    n_stages = len(reassemble_factors)
    for i, factor in enumerate(reassemble_factors):
        head[f"reassemble_{i}_projection"] = _conv2d(sd, f"head.projects.{i}")
        if factor > 1:
            head[f"reassemble_{i}_resize"] = _conv_transpose2d(
                sd, f"head.resize_layers.{i}")
        elif factor < 1:
            head[f"reassemble_{i}_resize"] = _conv2d(sd, f"head.resize_layers.{i}")
        head[f"neck_conv_{i}"] = _conv2d(sd, f"head.scratch.layer{i + 1}_rn")
    for i in range(n_stages):
        # fusion_{0} (deepest) is scratch.refinenet{n_stages}
        p = f"head.scratch.refinenet{n_stages - i}"
        fusion: Dict[str, Any] = {
            "projection": _conv2d(sd, p + ".out_conv"),
            "residual_layer2": {
                "convolution1": _conv2d(sd, p + ".resConfUnit2.conv1"),
                "convolution2": _conv2d(sd, p + ".resConfUnit2.conv2"),
            },
        }
        if i > 0:
            fusion["residual_layer1"] = {
                "convolution1": _conv2d(sd, p + ".resConfUnit1.conv1"),
                "convolution2": _conv2d(sd, p + ".resConfUnit1.conv2"),
            }
        else:
            # deepest refinenet never receives a residual; params exist in
            # the checkpoint but are unused (same as convert_vda)
            for q in (".resConfUnit1.conv1", ".resConfUnit1.conv2"):
                _conv2d(sd, p + q)
        head[f"fusion_{i}"] = fusion
    head["head_conv1"] = _conv2d(sd, "head.scratch.output_conv1")
    head["head_conv2"] = _conv2d(sd, "head.scratch.output_conv2.0")
    head["head_conv3"] = _conv2d(sd, "head.scratch.output_conv2.2")
    for i in range(num_temporal_blocks):
        head[f"temporal_{i}"] = _temporal_module(sd, f"head.motion_modules.{i}")
    return {"backbone": bb, "head": head}


def expected_vda_official_keys(num_layers: int = 24,
                               reassemble_factors=(4.0, 2.0, 1.0, 0.5),
                               num_temporal_blocks: int = 4,
                               num_attention_blocks: int = 2) -> set:
    """Expected key set of the official video_depth_anything_*.pth.

    Derived from the public Video-Depth-Anything code structure:
    video_depth.py (pretrained = torchhub DINOv2, head = DPTHeadTemporal),
    dpt_temporal.py (4 motion modules over out_channels[2], out_channels[3],
    features, features), motion_module.py (AnimateDiff TemporalModule with 1
    transformer block of 2 temporal self-attentions, GEGLU FF, persistent
    ``pos_encoder.pe`` buffer, zero-initialised proj_out).
    """
    keys: list = ["pretrained.cls_token", "pretrained.pos_embed",
                  "pretrained.mask_token"]
    keys += _wb("pretrained.patch_embed.proj")
    keys += _wb("pretrained.norm")
    for i in range(num_layers):
        p = f"pretrained.blocks.{i}"
        keys += _wb(p + ".norm1") + _wb(p + ".norm2")
        keys += _wb(p + ".attn.qkv") + _wb(p + ".attn.proj")
        keys += _wb(p + ".mlp.fc1") + _wb(p + ".mlp.fc2")
        keys += [p + ".ls1.gamma", p + ".ls2.gamma"]
    n = len(reassemble_factors)
    for i, factor in enumerate(reassemble_factors):
        keys += _wb(f"head.projects.{i}")
        if factor != 1:
            keys += _wb(f"head.resize_layers.{i}")
        keys.append(f"head.scratch.layer{i + 1}_rn.weight")
    for i in range(1, n + 1):
        p = f"head.scratch.refinenet{i}"
        keys += _wb(p + ".out_conv")
        for r in ("resConfUnit1", "resConfUnit2"):
            keys += _wb(f"{p}.{r}.conv1") + _wb(f"{p}.{r}.conv2")
    keys += _wb("head.scratch.output_conv1")
    keys += _wb("head.scratch.output_conv2.0") + _wb("head.scratch.output_conv2.2")
    for i in range(num_temporal_blocks):
        tt = f"head.motion_modules.{i}.temporal_transformer"
        keys += _wb(tt + ".norm") + _wb(tt + ".proj_in") + _wb(tt + ".proj_out")
        blk = f"{tt}.transformer_blocks.0"
        for k in range(num_attention_blocks):
            a = f"{blk}.attention_blocks.{k}"
            keys += [a + ".to_q.weight", a + ".to_k.weight", a + ".to_v.weight",
                     a + ".pos_encoder.pe"]
            keys += _wb(a + ".to_out.0")
            keys += _wb(f"{blk}.norms.{k}")
        keys += _wb(blk + ".ff.net.0.proj") + _wb(blk + ".ff.net.2")
        keys += _wb(blk + ".ff_norm")
    return set(keys)


def expected_vda_keys(num_layers: int = 24,
                      reassemble_factors=(4.0, 2.0, 1.0, 0.5)) -> set:
    """Expected checkpoint keys for HF single-image Depth Anything
    (transformers modeling_depth_anything.py module tree)."""
    keys: list = ["backbone.embeddings.cls_token",
                  "backbone.embeddings.position_embeddings",
                  # present in HF checkpoints (use_mask_token=True) but never
                  # used for backbone inference; consumed-and-dropped
                  "backbone.embeddings.mask_token"]
    keys += _wb("backbone.embeddings.patch_embeddings.projection")
    keys += _wb("backbone.layernorm")
    for i in range(num_layers):
        p = f"backbone.encoder.layer.{i}"
        keys += _wb(p + ".norm1") + _wb(p + ".norm2")
        for proj in ("query", "key", "value"):
            keys += _wb(f"{p}.attention.attention.{proj}")
        keys += _wb(p + ".attention.output.dense")
        keys += _wb(p + ".mlp.fc1") + _wb(p + ".mlp.fc2")
        keys += [p + ".layer_scale1.lambda1", p + ".layer_scale2.lambda1"]
    for i, factor in enumerate(reassemble_factors):
        p = f"neck.reassemble_stage.layers.{i}"
        keys += _wb(p + ".projection")
        if factor != 1:
            keys += _wb(p + ".resize")
        keys.append(f"neck.convs.{i}.weight")
    for i in range(len(reassemble_factors)):
        p = f"neck.fusion_stage.layers.{i}"
        keys += _wb(p + ".projection")
        for r in ("residual_layer1", "residual_layer2"):
            keys += _wb(f"{p}.{r}.convolution1") + _wb(f"{p}.{r}.convolution2")
    for c in ("conv1", "conv2", "conv3"):
        keys += _wb(f"head.{c}")
    return set(keys)


def adapt_patch_embed_in_channels(kernel: Array, target_in: int) -> Array:
    """Shape-adaptive patch-embed loading (reference
    crosstransformer3d.py:912-950 ``from_pretrained_2d``): when the
    checkpoint's conv has fewer input channels than the model (e.g. loading
    the 33-channel inpaint model from a 16/17-channel base), extra input
    channels are zero-initialised; when it has more, the surplus is cropped.

    kernel layout: flax conv (kh, kw, in, out).
    """
    kh, kw, cin, cout = kernel.shape
    if cin == target_in:
        return kernel
    if cin < target_in:
        pad = np.zeros((kh, kw, target_in - cin, cout), kernel.dtype)
        return np.concatenate([kernel, pad], axis=2)
    return kernel[:, :, :target_in, :]


def load_safetensors_dir(path: str) -> Dict[str, Array]:
    """Load all *.safetensors files in a directory into one flat dict."""
    import glob
    import os

    from safetensors.numpy import load_file

    sd: Dict[str, Array] = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        sd.update(load_file(f))
    return sd


# ----------------------------------------------------------------------------
# BLIP-2 captioner (transformers Blip2ForConditionalGeneration,
# Salesforce/blip2-opt-2.7b -> models/blip2.py names)
# ----------------------------------------------------------------------------


def convert_blip2(sd: Mapping[str, Array], vision_layers: int = 39,
                  qformer_layers: int = 12, opt_layers: int = 32,
                  cross_attention_frequency: int = 2) -> Dict[str, Any]:
    """HF Blip2ForConditionalGeneration state dict -> flax
    ``models.blip2.Blip2Captioner`` param tree (reference loads this family
    at demo.py:36-39)."""
    vm = "vision_model."
    vision: Dict[str, Any] = {
        "patch_embedding": _conv2d(sd, vm + "embeddings.patch_embedding"),
        "class_embedding": np.asarray(sd[vm + "embeddings.class_embedding"]),
        "position_embedding": np.asarray(sd[vm + "embeddings.position_embedding"]),
        "post_layernorm": _ln(sd, vm + "post_layernorm"),
    }
    for i in range(vision_layers):
        p = f"{vm}encoder.layers.{i}"
        vision[f"layers_{i}_layer_norm1"] = _ln(sd, p + ".layer_norm1")
        vision[f"layers_{i}_layer_norm2"] = _ln(sd, p + ".layer_norm2")
        vision[f"layers_{i}_self_attn"] = {
            "qkv": _lin(sd, p + ".self_attn.qkv"),
            "projection": _lin(sd, p + ".self_attn.projection"),
        }
        vision[f"layers_{i}_fc1"] = _lin(sd, p + ".mlp.fc1")
        vision[f"layers_{i}_fc2"] = _lin(sd, p + ".mlp.fc2")

    def qf_attention(prefix):
        return {
            "query": _lin(sd, prefix + ".attention.query"),
            "key": _lin(sd, prefix + ".attention.key"),
            "value": _lin(sd, prefix + ".attention.value"),
            "out": _lin(sd, prefix + ".output.dense"),
            "output_norm": _ln(sd, prefix + ".output.LayerNorm"),
        }

    qf: Dict[str, Any] = {
        "query_tokens": np.asarray(sd["query_tokens"]),
        "layernorm": _ln(sd, "qformer.layernorm"),
    }
    for i in range(qformer_layers):
        p = f"qformer.encoder.layer.{i}"
        qf[f"layer_{i}_attention"] = qf_attention(p + ".attention")
        if i % cross_attention_frequency == 0:
            qf[f"layer_{i}_crossattention"] = qf_attention(p + ".crossattention")
        qf[f"layer_{i}_intermediate_query"] = _lin(sd, p + ".intermediate_query.dense")
        qf[f"layer_{i}_output_query"] = _lin(sd, p + ".output_query.dense")
        qf[f"layer_{i}_output_query_norm"] = _ln(sd, p + ".output_query.LayerNorm")

    lm = "language_model.model.decoder."
    opt: Dict[str, Any] = {
        "embed_positions": np.asarray(sd[lm + "embed_positions.weight"]),
        "final_layer_norm": _ln(sd, lm + "final_layer_norm"),
    }
    for i in range(opt_layers):
        p = f"{lm}layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            opt[f"layers_{i}_{proj}"] = _lin(sd, f"{p}.self_attn.{proj}")
        opt[f"layers_{i}_self_attn_layer_norm"] = _ln(sd, p + ".self_attn_layer_norm")
        opt[f"layers_{i}_final_layer_norm"] = _ln(sd, p + ".final_layer_norm")
        opt[f"layers_{i}_fc1"] = _lin(sd, p + ".fc1")
        opt[f"layers_{i}_fc2"] = _lin(sd, p + ".fc2")

    if "language_model.lm_head.weight" in sd:
        np.asarray(sd["language_model.lm_head.weight"])  # tied; consume-drop
    query_tokens = qf.pop("query_tokens")
    return {
        "vision_model": vision,
        "qformer": {"query_tokens": query_tokens, **qf},
        "language_projection": _lin(sd, "language_projection"),
        "language_model": opt,
        "embed_tokens": {"embedding": np.asarray(sd[lm + "embed_tokens.weight"])},
    }


# ----------------------------------------------------------------------------
# Checkpoint key contracts
#
# The exact state-dict key sets the published checkpoints use, derived by
# reading the reference module trees (crosstransformer3d.py /
# autoencoder_magvit.py) -- NOT from our own converters, so a typo'd key name
# in convert_* (e.g. "attn1.to_out" vs "attn1.to_out.0") fails the contract
# test instead of silently dropping a weight at load time.
# ----------------------------------------------------------------------------


def _wb(prefix: str) -> list:
    return [prefix + ".weight", prefix + ".bias"]


def expected_dit_keys(num_layers: int = 42, cross_attn_interval: int = 2,
                      has_ref_branch: bool = True,
                      attention_bias: bool = True) -> set:
    """Expected checkpoint keys for the TrajectoryCrafter CrossTransformer3D.

    Module tree read from reference crosstransformer3d.py:
      patch_embed (CogVideoXPatchEmbed: proj Conv2d + text_proj Linear, :47-66),
      ref_patch_embed (RefPatchEmbed: proj Conv2d, :95-112, built at :576),
      time_embedding (diffusers TimestepEmbedding linear_1/linear_2, :532),
      transformer_blocks.{i} (CogVideoXBlock :140: norm1/norm2 =
        CogVideoXLayerNormZero(linear + affine LayerNorm, bias=True :196-198),
        attn1 = diffusers Attention(qk_norm="layer_norm" -> norm_q/norm_k,
        bias=attention_bias [default True :443], out proj at to_out.0, :199-208),
        ff = diffusers FeedForward gelu-approximate (net.0.proj, net.2, :215-222)),
      norm_final (LayerNorm :553), norm_out (diffusers AdaLayerNorm:
        linear + norm, :556-562), proj_out (Linear :563),
      perceiver_cross_attention.{i} (PerceiverCrossAttention :287-324:
        norm1/norm2 LayerNorm, to_q/to_kv/to_out Linear bias=False).
    pos_embedding is a non-persistent buffer (:529) -> not in the checkpoint.
    """
    keys: list = []
    keys += _wb("patch_embed.proj") + _wb("patch_embed.text_proj")
    if has_ref_branch:
        keys += _wb("ref_patch_embed.proj")
    keys += _wb("time_embedding.linear_1") + _wb("time_embedding.linear_2")
    keys += _wb("norm_final") + _wb("norm_out.linear") + _wb("norm_out.norm")
    keys += _wb("proj_out")
    for i in range(num_layers):
        p = f"transformer_blocks.{i}"
        keys += _wb(f"{p}.norm1.linear") + _wb(f"{p}.norm1.norm")
        keys += _wb(f"{p}.norm2.linear") + _wb(f"{p}.norm2.norm")
        for proj in ("to_q", "to_k", "to_v"):
            keys.append(f"{p}.attn1.{proj}.weight")
            if attention_bias:
                keys.append(f"{p}.attn1.{proj}.bias")
        keys += _wb(f"{p}.attn1.to_out.0")
        keys += _wb(f"{p}.attn1.norm_q") + _wb(f"{p}.attn1.norm_k")
        keys += _wb(f"{p}.ff.net.0.proj") + _wb(f"{p}.ff.net.2")
    if has_ref_branch:
        for i in range(num_layers // cross_attn_interval):
            p = f"perceiver_cross_attention.{i}"
            keys += _wb(f"{p}.norm1") + _wb(f"{p}.norm2")
            keys += [f"{p}.to_q.weight", f"{p}.to_kv.weight", f"{p}.to_out.weight"]
    return set(keys)


def expected_vae_keys(block_out_channels=(128, 256, 256, 512),
                      layers_per_block: int = 3) -> set:
    """Expected checkpoint keys for the CogVideoX-Fun 3D VAE.

    Module tree read from reference autoencoder_magvit.py:
      CausalConv3d wraps its conv at ".conv" (:126); SpatialNorm3D =
      norm_layer GroupNorm + conv_y/conv_b CausalConv3d (:189-196);
      ResnetBlock3D: norm1/norm2 (GroupNorm in encoder, SpatialNorm3D in
      decoder :242-281), conv1/conv2 CausalConv3d (:283-301), conv_shortcut =
      plain SafeConv3d k=1 when channels change (use_conv_shortcut defaults
      False, :303-318); encoder (:663-760): conv_in, down_blocks.{i}.resnets
      + downsamplers.0.conv (Conv2d inside CogVideoXDownsample3D) on all but
      the last block, mid_block.resnets.{0,1}, norm_out GroupNorm, conv_out;
      decoder (:803-910): conv_in, mid_block, up_blocks.{i} with
      layers_per_block+1 resnets + upsamplers.0.conv on all but the last
      block, norm_out SpatialNorm3D, conv_out.  quant_conv/post_quant_conv
      are disabled for this checkpoint (use_quant_conv=False, :1022-1056);
      temb_channels=0 -> no temb_proj (:290).
    """
    def causal(prefix):
        return _wb(prefix + ".conv")

    def spatial_norm(prefix):
        return (_wb(prefix + ".norm_layer") + causal(prefix + ".conv_y")
                + causal(prefix + ".conv_b"))

    def resnet(prefix, spatial: bool, shortcut: bool):
        keys = causal(prefix + ".conv1") + causal(prefix + ".conv2")
        if spatial:
            keys += spatial_norm(prefix + ".norm1") + spatial_norm(prefix + ".norm2")
        else:
            keys += _wb(prefix + ".norm1") + _wb(prefix + ".norm2")
        if shortcut:
            keys += _wb(prefix + ".conv_shortcut")
        return keys

    n = len(block_out_channels)
    keys: list = []
    # encoder: channels go block_out[0] -> block_out[i] (encoder :687-744)
    keys += causal("encoder.conv_in")
    ch = block_out_channels[0]
    for i in range(n):
        for j in range(layers_per_block):
            shortcut = j == 0 and block_out_channels[i] != ch
            keys += resnet(f"encoder.down_blocks.{i}.resnets.{j}", False, shortcut)
        ch = block_out_channels[i]
        if i < n - 1:
            keys += _wb(f"encoder.down_blocks.{i}.downsamplers.0.conv")
    for j in range(2):
        keys += resnet(f"encoder.mid_block.resnets.{j}", False, False)
    keys += _wb("encoder.norm_out") + causal("encoder.conv_out")
    # decoder: channels go reversed[0] -> reversed[i] (decoder :827-903)
    rev = tuple(reversed(block_out_channels))
    keys += causal("decoder.conv_in")
    for j in range(2):
        keys += resnet(f"decoder.mid_block.resnets.{j}", True, False)
    ch = rev[0]
    for i in range(n):
        for j in range(layers_per_block + 1):
            shortcut = j == 0 and rev[i] != ch
            keys += resnet(f"decoder.up_blocks.{i}.resnets.{j}", True, shortcut)
        ch = rev[i]
        if i < n - 1:
            keys += _wb(f"decoder.up_blocks.{i}.upsamplers.0.conv")
    keys += spatial_norm("decoder.norm_out") + causal("decoder.conv_out")
    return set(keys)


class RecordingDict(dict):
    """State-dict wrapper that records which keys a converter reads."""

    def __init__(self, sd: Mapping[str, Array]):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def verify_state_dict(sd: Mapping[str, Array], expected: set, label: str,
                      ignore_suffixes: tuple = (".position_ids",)) -> None:
    """Hard-fail when a checkpoint's key set doesn't match the contract.

    Replaces the reference's load_state_dict(strict=False) + printed
    missing/unexpected counts (crosstransformer3d.py:963-965) with an
    actionable error: a wrong checkpoint dir or a converter/naming drift
    should fail loudly, not silently drop weights.
    """
    present = {k for k in sd if not k.endswith(ignore_suffixes)}
    missing = sorted(expected - present)
    unexpected = sorted(present - expected)
    if missing or unexpected:
        def _fmt(keys):
            head = ", ".join(keys[:8])
            return f"{len(keys)} keys ({head}{', ...' if len(keys) > 8 else ''})"

        raise ValueError(
            f"{label}: checkpoint key set does not match the expected "
            f"{label} contract. Missing: {_fmt(missing) if missing else 'none'}. "
            f"Unexpected: {_fmt(unexpected) if unexpected else 'none'}. "
            "Check that the directory holds the right model family "
            "(see SURVEY.md section 1 zoo table) and matches config.json."
        )


# ----------------------------------------------------------------------------
# Conversion CLI: python -m trajectorycrafter_tpu.utils.convert
#
# Stands up the model zoo from downloaded HF checkpoints (the reference
# fetches them with download/download_hf.py:5-30 and loads via diffusers
# from_pretrained at demo.py:636-666 / models/infer.py:20-31); here each
# family is converted once to an orbax checkpoint for fast mmap loads.
# ----------------------------------------------------------------------------


_COMPONENTS = ("dit", "vae", "t5", "clip", "svd_unet", "svd_vae", "vda",
               "vda_official", "blip2")


def _convert_component(component: str, src: str, num_layers: int = 42,
                       cross_attn_interval: int = 2):
    import json
    import os

    if component == "vda_official":
        # the official Video-Depth-Anything release ships a torch .pth
        # (video_depth_anything_{vits,vitl}.pth), not safetensors
        import torch

        path = src
        if os.path.isdir(src):
            pths = [f for f in sorted(os.listdir(src)) if f.endswith(".pth")]
            if not pths:
                raise FileNotFoundError(f"no *.pth under {src}")
            path = os.path.join(src, pths[0])
        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
        num_layers = sum(1 for k in sd if k.endswith(".ls1.gamma"))
        verify_state_dict(sd, expected_vda_official_keys(num_layers),
                          "vda_official")
        return convert_vda_official(sd, num_layers)

    sd = load_safetensors_dir(src)
    if not sd:
        raise FileNotFoundError(f"no *.safetensors under {src}")
    cfg = {}
    cfg_path = os.path.join(src, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    if component == "dit":
        num_layers = cfg.get("num_layers", num_layers)
        interval = cfg.get("cross_attn_interval", cross_attn_interval)
        verify_state_dict(
            sd, expected_dit_keys(num_layers, interval,
                                  has_ref_branch="ref_patch_embed.proj.weight" in sd),
            "dit")
        return convert_dit(sd, num_layers, interval)
    if component == "vae":
        verify_state_dict(
            sd,
            expected_vae_keys(tuple(cfg.get("block_out_channels",
                                            (128, 256, 256, 512))),
                              cfg.get("layers_per_block", 3)),
            "vae")
        return convert_vae(sd, cfg.get("layers_per_block", 3))
    if component == "t5":
        return convert_t5_encoder(sd, cfg.get("num_layers", 24))
    if component == "clip":
        return convert_clip_vision(sd, cfg.get("num_hidden_layers", 32))
    if component == "svd_unet":
        return convert_svd_unet(sd)
    if component == "svd_vae":
        return convert_svd_vae(sd)
    if component == "vda":
        bcfg = cfg.get("backbone_config", {})
        num_layers = bcfg.get("num_hidden_layers", 24)
        factors = tuple(cfg.get("reassemble_factors", (4.0, 2.0, 1.0, 0.5)))
        verify_state_dict(sd, expected_vda_keys(num_layers, factors), "vda")
        return convert_vda(sd, num_layers, reassemble_factors=factors)
    if component == "blip2":
        return convert_blip2(
            sd,
            vision_layers=cfg.get("vision_config", {}).get("num_hidden_layers", 39),
            qformer_layers=cfg.get("qformer_config", {}).get("num_hidden_layers", 12),
            opt_layers=cfg.get("text_config", {}).get("num_hidden_layers", 32),
            cross_attention_frequency=cfg.get("qformer_config", {}).get(
                "cross_attention_frequency", 2))
    raise ValueError(f"unknown component {component!r}; pick from {_COMPONENTS}")


def main(argv=None) -> int:
    import argparse
    import os

    parser = argparse.ArgumentParser(
        prog="python -m trajectorycrafter_tpu.utils.convert",
        description="Convert a downloaded HF torch checkpoint directory to an "
                    "orbax checkpoint loadable by trajectorycrafter_tpu.",
    )
    parser.add_argument("src", help="HF checkpoint dir holding *.safetensors "
                        "(e.g. .../TrajectoryCrafter/transformer)")
    parser.add_argument("out", help="output orbax checkpoint directory")
    parser.add_argument("--component", choices=_COMPONENTS, required=True,
                        help="model family the src dir holds")
    args = parser.parse_args(argv)

    params = _convert_component(args.component, args.src)
    from trajectorycrafter_tpu.utils.checkpoints import save_params

    save_params(params, args.out)
    n = sum(int(np.prod(np.shape(a)))
            for a in __import__("jax").tree.leaves(params))
    print(f"[convert] {args.component}: {args.src} -> {os.path.abspath(args.out)} "
          f"({n/1e6:.1f}M params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
