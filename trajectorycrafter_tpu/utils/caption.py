"""BLIP-2 video captioning (host-side prologue).

The reference captions the middle frame with BLIP-2 and appends a refine
prompt (demo.py:36-39, 526-536).  Captioning runs once per video on a single
frame, so it stays a host prologue: when the BLIP-2 checkpoint is available
locally it runs through transformers on CPU; otherwise ``--prompt`` supplies
the caption (the CLI accepts it, matching the reference's --prompt flag).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def build_captioner(blip_path: str, fallback_prompt: Optional[str] = None) -> Callable:
    """-> caption(frame_hw3_float01) -> str."""
    if os.path.isdir(blip_path):
        try:
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
        except Exception as e:
            print(f"[trajcrafter-tpu] BLIP-2 unavailable ({e}); using fixed prompt")

    def fixed(frame: np.ndarray) -> str:
        return fallback_prompt or "a video"

    return fixed
