"""Checkpoint loading: HF zoo -> jax params, plus orbax save/restore.

Replaces the reference's diffusers ``from_pretrained`` stack
(demo.py:634-671) and the shape-adaptive safetensors loaders
(crosstransformer3d.py:874-1092).  Downloaded HF checkpoints are converted
once (utils/convert.py) and cached as orbax checkpoints for fast mmap loads.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp


def save_params(params: Any, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def _cast_tree(tree, dtype, host: bool = False):
    """Cast to ``dtype``; ``host=True`` keeps the tree in host RAM (numpy)
    for stage-offloaded loading (utils/offload.py) instead of placing it
    on device immediately."""
    if host:
        from trajectorycrafter_tpu.utils.offload import host_cast

        return host_cast(tree, dtype)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


def load_dit(transformer_path: str, dtype=jnp.bfloat16, quant: str = "none",
             host: bool = False, **model_kwargs):
    """Load the TrajectoryCrafter CrossTransformer3D checkpoint.

    ``quant="int8"``: the block attention/FF kernels are quantized host-side
    to per-output-channel int8 (ops/int8.py) and the model runs those GEMMs
    on the int8 MXU path (--quant int8; measured 13.6 -> 12.6 s/step at
    49f@576x1024, docs/COVERAGE.md)."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.utils.convert import convert_dit, load_safetensors_dir

    cfg_path = os.path.join(transformer_path, "config.json")
    kwargs = dict(model_kwargs)
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        kwargs.setdefault("num_attention_heads", hf.get("num_attention_heads", 48))
        kwargs.setdefault("attention_head_dim", hf.get("attention_head_dim", 64))
        kwargs.setdefault("num_layers", hf.get("num_layers", 42))
        kwargs.setdefault("in_channels", hf.get("in_channels", 33))
        kwargs.setdefault(
            "use_rotary_positional_embeddings",
            hf.get("use_rotary_positional_embeddings", True),
        )
        kwargs.setdefault("cross_attn_interval", hf.get("cross_attn_interval", 2))
        for opt in ("out_channels", "cross_attn_dim_head",
                    "cross_attn_num_heads", "time_embed_dim",
                    "text_embed_dim", "max_text_seq_length"):
            if opt in hf:
                kwargs.setdefault(opt, hf[opt])
    model = CrossTransformer3DModel(dtype=dtype, param_dtype=dtype,
                                    quant=quant, **kwargs)
    sd = load_safetensors_dir(transformer_path)
    from trajectorycrafter_tpu.utils.convert import (
        expected_dit_keys,
        verify_state_dict,
    )

    verify_state_dict(
        sd,
        expected_dit_keys(
            model.num_layers, model.cross_attn_interval,
            has_ref_branch="ref_patch_embed.proj.weight" in sd,
        ),
        "dit",
    )
    params = convert_dit(sd, model.num_layers, model.cross_attn_interval)
    # shape-adaptive patch embed (reference from_pretrained_2d channel pad/crop)
    from trajectorycrafter_tpu.utils.convert import adapt_patch_embed_in_channels

    params["patch_embed_proj"]["kernel"] = adapt_patch_embed_in_channels(
        params["patch_embed_proj"]["kernel"], model.in_channels
    )
    if quant == "int8":
        # quantize on the host BEFORE device placement (the bf16 + int8
        # twins of a 6.1B tree would exceed HBM together); kernel_q stays
        # int8 and the quantization scales stay fp32, everything else casts
        from trajectorycrafter_tpu.ops.int8 import quantize_dit_params

        params = quantize_dit_params(params)
        if host:
            return model, _cast_tree(params, dtype, host=True)
        return model, _place_quantized(params, dtype)
    return model, _cast_tree(params, dtype, host=host)


def _place_quantized(tree, dtype):
    """Device-place a host-quantized tree: kernel_q stays int8, its fp32
    scale side-car is not downcast, everything else casts to ``dtype``."""
    if isinstance(tree, dict):
        if "kernel_q" in tree:
            out = {"kernel_q": jnp.asarray(tree["kernel_q"]),
                   "scale": jnp.asarray(tree["scale"])}
            if "bias" in tree:
                out["bias"] = jnp.asarray(tree["bias"], dtype)
            return out
        return {k: _place_quantized(v, dtype) for k, v in tree.items()}
    return jnp.asarray(tree, dtype)


def load_vae(vae_path: str, dtype=jnp.bfloat16, host: bool = False):
    from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
    from trajectorycrafter_tpu.utils.convert import convert_vae, load_safetensors_dir

    model = AutoencoderKLCogVideoX(dtype=dtype, param_dtype=dtype)
    sd = load_safetensors_dir(vae_path)
    from trajectorycrafter_tpu.utils.convert import (
        expected_vae_keys,
        verify_state_dict,
    )

    verify_state_dict(sd, expected_vae_keys(), "vae")
    params = convert_vae(sd)
    return model, _cast_tree(params, dtype, host=host)


def load_t5(text_encoder_path: str, dtype=jnp.bfloat16, host: bool = False):
    from trajectorycrafter_tpu.models.t5 import T5EncoderModel, t5_xxl_config
    from trajectorycrafter_tpu.utils.convert import (
        convert_t5_encoder,
        load_safetensors_dir,
    )

    cfg = t5_xxl_config()
    model = T5EncoderModel(cfg, dtype=dtype, param_dtype=dtype)
    sd = load_safetensors_dir(text_encoder_path)
    params = convert_t5_encoder(sd, cfg.num_layers)
    return model, _cast_tree(params, dtype, host=host)


def load_full_bundle(cfg) -> "ModelBundle":
    """Assemble the complete inference bundle from a checkpoint directory
    laid out like the reference's (model_name/{vae,text_encoder,scheduler},
    transformer_path/).

    Residency policy (``cfg.offload``): a real-weight bundle is ~35 GB of
    bf16 params (6.1B DiT + 4.7B T5-XXL + SVD UNet + CLIP-H + BLIP-2) and
    cannot co-reside in one v5e chip's 16 GB HBM.  ``"stage"`` keeps every
    model host-resident and device-places it only for its pipeline stage
    (utils/offload.py -- the reference's accelerate CPU-offload hooks,
    models/infer.py:34-43, re-expressed for TPU); ``"none"`` keeps today's
    fully device-resident behaviour; ``"auto"`` (default) offloads only
    when the loaded bundle exceeds ~80% of device memory.
    """
    from trajectorycrafter_tpu.orchestrator import (
        ModelBundle,
        _plane_depth_infer,
        maybe_shard_pipeline,
    )
    from trajectorycrafter_tpu.pipelines.trajcrafter import TrajCrafterPipeline
    from trajectorycrafter_tpu.schedulers import SCHEDULER_REGISTRY
    from trajectorycrafter_tpu.utils.offload import StageParams, should_offload

    dtype = jnp.bfloat16
    mode = getattr(cfg, "offload", "auto")
    host = mode != "none"
    staged = []

    def wrap(tree, name):
        if not host:
            return tree
        sp = StageParams(tree, offload=False, name=name)  # policy set below
        staged.append(sp)
        return sp

    vae, vae_params = load_vae(os.path.join(cfg.diffusion.model_name, "vae"),
                               dtype, host=host)
    vae_params = wrap(vae_params, "vae")
    dit, dit_params = load_dit(cfg.diffusion.transformer_path, dtype,
                               quant=cfg.diffusion.quant, host=host)
    dit_params = wrap(dit_params, "dit")
    scheduler = SCHEDULER_REGISTRY[cfg.diffusion.sampler_name]()
    pipeline = TrajCrafterPipeline(
        vae=vae, vae_params=vae_params, transformer=dit,
        transformer_params=dit_params, scheduler=scheduler, dtype=dtype,
    )

    # text encoder + tokenizer (the reference always loads both,
    # demo.py:643-657; dev stubs are opt-in via --allow_dev_stubs)
    te_path = os.path.join(cfg.diffusion.model_name, "text_encoder")
    tok_path = os.path.join(cfg.diffusion.model_name, "tokenizer")
    encode_prompt = None
    try:
        if not os.path.isdir(te_path):
            raise FileNotFoundError(
                f"text encoder directory missing: {te_path} -- download the "
                "CogVideoX-Fun text_encoder/ + tokenizer/ folders"
            )
        t5, t5_params = load_t5(te_path, dtype, host=host)
        t5_params = wrap(t5_params, "t5")
        from trajectorycrafter_tpu.utils.offload import release, resolve
        from trajectorycrafter_tpu.utils.tokenizer import T5Tokenizer

        tok = T5Tokenizer(tok_path)

        def encode_prompt(prompt, negative):
            def enc(text):
                ids = tok(text, max_length=226)
                return t5.apply({"params": resolve(t5_params)}, jnp.asarray(ids))

            pe, ne = enc(prompt or ""), enc(negative or "")
            ne.block_until_ready()
            release(t5_params)
            return pe, ne
    except Exception as e:
        if not cfg.allow_dev_stubs:
            raise RuntimeError(
                f"text encoder/tokenizer unavailable ({e}). Real prompts are "
                "load-bearing for output quality; pass --allow_dev_stubs to "
                "run with deterministic pseudo text embeddings instead."
            ) from e
        print(f"[trajcrafter-tpu] text encoder unavailable ({e}); "
              "falling back to pseudo-embeddings (--allow_dev_stubs)")
        from trajectorycrafter_tpu.orchestrator import _pseudo_text_embeds

        encode_prompt = lambda p, n: (
            _pseudo_text_embeds(p or "", 226, 4096),
            _pseudo_text_embeds(n or "", 226, 4096),
        )

    # DepthCrafter (reference models/infer.py:12-50)
    try:
        if not os.path.isdir(cfg.depth.unet_path):
            raise FileNotFoundError(
                f"DepthCrafter UNet directory missing: {cfg.depth.unet_path}"
            )
        depth_infer = load_depthcrafter(cfg, dtype, host=host, wrap=wrap)
    except Exception as e:
        if not cfg.allow_dev_stubs:
            raise RuntimeError(
                f"DepthCrafter unavailable ({e}). Depth drives the warp "
                "geometry; pass --allow_dev_stubs to run with a constant-"
                "plane depth stub instead."
            ) from e
        print(f"[trajcrafter-tpu] DepthCrafter unavailable ({e}); "
              "using plane-depth stub (--allow_dev_stubs)")
        depth_infer = _plane_depth_infer

    from trajectorycrafter_tpu.utils.caption import build_captioner

    captioner = (
        (lambda frame: cfg.diffusion.prompt)
        if cfg.diffusion.prompt
        # BLIP-2 runs exactly once per video before everything else, so in
        # host mode it always releases its device copy afterwards
        else build_captioner(cfg.diffusion.blip_path, offload=host)
    )

    # decide the stage-offload policy now that every component's size is known
    if staged:
        total = sum(sp.nbytes() for sp in staged)
        off = mode == "stage" or (mode == "auto" and should_offload(total))
        for sp in staged:
            sp.offload = off
        print(f"[trajcrafter-tpu] bundle params {total/1e9:.1f} GB -> "
              f"stage offload {'ON' if off else 'off'} (--offload {mode})")

    pipeline = maybe_shard_pipeline(cfg, pipeline)
    return ModelBundle(
        pipeline=pipeline,
        depth_infer=depth_infer,
        encode_prompt=encode_prompt,
        get_caption=captioner,
    )


def load_depthcrafter(cfg, dtype=jnp.bfloat16, host: bool = False, wrap=None):
    """Build the windowed depth callable from converted SVD/DepthCrafter
    checkpoints (interface matches reference models/infer.py:52).

    ``host``/``wrap``: stage-offload plumbing from load_full_bundle --
    params stay host-resident and are wrapped as StageParams.
    """
    from trajectorycrafter_tpu.models.clip import (
        CLIPVisionModelWithProjection,
        clip_vit_h14_config,
    )
    from trajectorycrafter_tpu.models.depthcrafter import (
        UNetSpatioTemporalConditionModel,
    )
    from trajectorycrafter_tpu.models.svd_vae import AutoencoderKLTemporalDecoder
    from trajectorycrafter_tpu.pipelines.depth import (
        DepthCrafterDemo,
        DepthCrafterPipeline,
    )
    from trajectorycrafter_tpu.utils.convert import (
        convert_clip_vision,
        convert_svd_unet,
        convert_svd_vae,
        load_safetensors_dir,
    )

    if wrap is None:
        wrap = lambda tree, name: tree
    quant = getattr(cfg.depth, "quant", "none")
    unet = UNetSpatioTemporalConditionModel(dtype=dtype, param_dtype=dtype,
                                            quant=quant)
    unet_raw = convert_svd_unet(load_safetensors_dir(cfg.depth.unet_path))
    if quant == "int8":
        # transformer GEMMs to per-output-channel int8, host-side (same
        # scheme/measured path as load_dit; --quant_depth int8)
        from trajectorycrafter_tpu.ops.int8 import quantize_depth_unet_params

        unet_raw = quantize_depth_unet_params(unet_raw)
        unet_params = wrap(
            _cast_tree(unet_raw, dtype, host=True) if host
            else _place_quantized(unet_raw, dtype), "svd_unet")
    else:
        unet_params = wrap(_cast_tree(unet_raw, dtype, host=host), "svd_unet")
    vae = AutoencoderKLTemporalDecoder(dtype=dtype, param_dtype=dtype)
    vae_params = wrap(_cast_tree(
        convert_svd_vae(load_safetensors_dir(
            os.path.join(cfg.depth.pre_train_path, "vae"))),
        dtype, host=host), "svd_vae")
    image_encoder = image_encoder_params = None
    ie_path = os.path.join(cfg.depth.pre_train_path, "image_encoder")
    if os.path.isdir(ie_path):
        clip_cfg = clip_vit_h14_config()
        image_encoder = CLIPVisionModelWithProjection(clip_cfg, dtype=dtype,
                                                      param_dtype=dtype)
        image_encoder_params = wrap(_cast_tree(
            convert_clip_vision(load_safetensors_dir(ie_path),
                                clip_cfg.num_hidden_layers),
            dtype, host=host), "clip")
    pipe = DepthCrafterPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        image_encoder=image_encoder, image_encoder_params=image_encoder_params,
        dtype=dtype,
    )
    from trajectorycrafter_tpu.orchestrator import stage_mesh

    mesh = stage_mesh(cfg)
    if mesh is not None:
        pipe = pipe.with_mesh(mesh)
    return DepthCrafterDemo(pipe).infer
