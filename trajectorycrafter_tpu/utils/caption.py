"""BLIP-2 video captioning.

The reference captions the middle frame with BLIP-2 and appends a refine
prompt (demo.py:36-39, 526-536).  Captioning runs once per video on a single
frame.  Resolution order:

  1. **native** (models/blip2.py): when ``blip_path`` holds the HF
     safetensors + tokenizer files, the checkpoint converts through
     utils/convert.convert_blip2 and the whole stack (EVA ViT-g -> Q-Former
     -> OPT greedy decode) runs as jit programs, decoded by the from-scratch
     GPT-2 BPE tokenizer (utils/bpe.py);
  2. transformers on CPU (host fallback, e.g. for a .bin-only download);
  3. a fixed ``--prompt`` (the CLI accepts it, matching the reference).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def _native_captioner(blip_path: str, offload: bool = False) -> Optional[Callable]:
    import glob

    if not glob.glob(os.path.join(blip_path, "*.safetensors")):
        return None
    if not os.path.isfile(os.path.join(blip_path, "vocab.json")):
        return None

    import json

    import jax.numpy as jnp

    from trajectorycrafter_tpu.models.blip2 import (
        Blip2Captioner,
        blip2_config_from_hf,
        generate_caption_ids,
        preprocess_frame,
    )
    from trajectorycrafter_tpu.utils.bpe import GPT2BPETokenizer
    from trajectorycrafter_tpu.utils.convert import (
        convert_blip2,
        load_safetensors_dir,
    )

    with open(os.path.join(blip_path, "config.json")) as f:
        cfg = blip2_config_from_hf(json.load(f))
    gen_path = os.path.join(blip_path, "generation_config.json")
    # HF `max_length` counts the whole decoder sequence including the BOS it
    # starts from, so 20 (blip2-opt-2.7b's shipped config, and transformers'
    # default) means at most 19 *new* tokens
    max_new, eos = 19, cfg.eos_token_id
    if os.path.isfile(gen_path):
        with open(gen_path) as f:
            gen = json.load(f)
        eos = gen.get("eos_token_id", eos)
        if "max_new_tokens" in gen:
            max_new = gen["max_new_tokens"]
        elif "max_length" in gen:
            max_new = max(int(gen["max_length"]) - 1, 1)

    sd = load_safetensors_dir(blip_path)
    params = convert_blip2(
        sd, vision_layers=cfg.vision_layers, qformer_layers=cfg.qformer_layers,
        opt_layers=cfg.opt_layers,
        cross_attention_frequency=cfg.cross_attention_frequency)
    del sd
    model = Blip2Captioner(cfg, dtype=jnp.bfloat16)
    tokenizer = GPT2BPETokenizer.from_dir(blip_path)
    # captioning runs once per video before everything else; in offload mode
    # the ~8 GB stack is device-placed just for that call (utils/offload.py)
    from trajectorycrafter_tpu.utils.offload import StageParams

    staged = StageParams(params, offload=offload, name="blip2")

    def caption(frame: np.ndarray) -> str:
        with staged as p:
            ids = generate_caption_ids(model, p,
                                       preprocess_frame(frame, cfg.image_size),
                                       max_new_tokens=max_new, eos_token_id=eos)
            ids = np.asarray(ids[0])
        return tokenizer.decode(ids).strip()

    return caption


def _transformers_captioner(blip_path: str) -> Callable:
    import torch
    from transformers import AutoProcessor, Blip2ForConditionalGeneration

    processor = AutoProcessor.from_pretrained(blip_path)
    model = Blip2ForConditionalGeneration.from_pretrained(
        blip_path, torch_dtype=torch.float32
    ).eval()

    def caption(frame: np.ndarray) -> str:
        from PIL import Image

        img = Image.fromarray((frame * 255).astype(np.uint8))
        inputs = processor(images=img, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(**inputs)
        return processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    return caption


def build_captioner(blip_path: str, fallback_prompt: Optional[str] = None,
                    offload: bool = False) -> Callable:
    """-> caption(frame_hw3_float01) -> str."""
    if os.path.isdir(blip_path):
        try:
            native = _native_captioner(blip_path, offload=offload)
            if native is not None:
                return native
        except Exception as e:
            print(f"[trajcrafter-tpu] native BLIP-2 failed ({e}); "
                  "trying transformers")
        try:
            return _transformers_captioner(blip_path)
        except Exception as e:
            print(f"[trajcrafter-tpu] BLIP-2 unavailable ({e}); using fixed prompt")

    def fixed(frame: np.ndarray) -> str:
        return fallback_prompt or "a video"

    return fixed
