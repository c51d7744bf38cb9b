"""Training-time validation metrics + observability helpers.

Mirrors the reference's held-out validation and sanity instrumentation
(notebooks/05_11_25_training/lora_utils_ours/validation.py:28-135 and
training_loop.py:312-321):
  * relative depth error over all / inpainted / non-inpainted pixels
    (validation.py:38-133, with the [1, 100] depth unnormalisation at :31-35
    and the >127.5 inpaint-mask threshold at :118);
  * temporal alignment error (shared with depth_alignment.py);
  * a deterministic held-out eval loss (the jit'able analogue of running the
    training objective without conditioning dropout at fixed seeds);
  * first-batch shape/mean/std sanity dump;
  * a jsonl metrics sink replacing accelerate's tensorboard logging
    (training_loop.py:277).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.depth_alignment import temporal_alignment_error


def unnormalize_depth(depth: jnp.ndarray, depth_min: float = 1.0,
                      depth_max: float = 100.0) -> jnp.ndarray:
    """[0, 1]-normalised depth video -> metric depth; zeros stay zero
    (reference validation.py:31-35)."""
    out = depth * (depth_max - depth_min) + depth_min
    return jnp.where(depth > 0, out, 0.0)


def relative_depth_error(pred: jnp.ndarray, gt: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """mean |pred - gt| / gt over mask & gt > 1e-6 (validation.py:38-58);
    NaN when the mask selects nothing, matching the reference."""
    valid = mask & (gt > 1e-6)
    err = jnp.abs(pred - gt) / jnp.maximum(gt, 1e-6)
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(jnp.where(valid, err, 0.0)) / n, jnp.nan)


def depth_error_metrics(pred_video: jnp.ndarray, gt_video: jnp.ndarray,
                        masks: jnp.ndarray,
                        mask_threshold: float = 127.5) -> Dict[str, Any]:
    """Rel-depth error split by inpainted region (validation.py:86-133).

    pred_video/gt_video: (F, H, W, 3) depth-as-rgb videos in [0, 1] (channel
    mean is taken, as the reference does for its 3-channel depth renders);
    masks: (F, H, W) where > mask_threshold marks inpainted pixels.
    """
    pred = unnormalize_depth(jnp.mean(pred_video, axis=-1))
    gt = unnormalize_depth(jnp.mean(gt_video, axis=-1))
    inpainted = masks > mask_threshold
    out = {
        "overall_rel_error": relative_depth_error(pred, gt,
                                                  jnp.ones_like(inpainted)),
        "inpainted_rel_error": relative_depth_error(pred, gt, inpainted),
        "non_inpainted_rel_error": relative_depth_error(pred, gt, ~inpainted),
        "tae": temporal_alignment_error(pred[:, None]),
        "inpainted_pixels": jnp.sum(inpainted),
        "non_inpainted_pixels": jnp.sum(~inpainted),
    }
    return {k: float(v) for k, v in out.items()}


def make_eval_loss(model, base_params, scheduler, sch_state,
                   prediction_type: str = "v_prediction",
                   lora_alpha: float = 8.0, lora_rank: int = 8,
                   num_train_timesteps: int = 1000) -> Callable:
    """Deterministic held-out loss: the training objective with conditioning
    dropout off and timesteps stratified over the schedule, so successive
    validations are comparable run to run."""
    from trajectorycrafter_tpu.training.lora import apply_lora

    def eval_loss(lora, batch, rng):
        params = (apply_lora(base_params, lora, lora_alpha, lora_rank)
                  if lora is not None else base_params)
        x0 = batch["gt_latents"].astype(jnp.float32)
        b = x0.shape[0]
        # stratified timesteps: evenly spaced, deterministic given b
        timesteps = jnp.linspace(0, num_train_timesteps - 1, b).astype(jnp.int32)
        noise = jax.random.normal(rng, x0.shape, jnp.float32)
        noisy = scheduler.add_noise(sch_state, x0, noise, timesteps)
        pred = model.apply(
            {"params": params},
            noisy.astype(model.dtype),
            batch["prompt_embeds"].astype(model.dtype),
            timesteps.astype(jnp.float32),
            inpaint_latents=batch["inpaint_latents"].astype(model.dtype),
            cross_latents=batch["ref_latents"].astype(model.dtype),
            image_rotary_emb=batch.get("rope"),
        ).astype(jnp.float32)
        if prediction_type == "v_prediction":
            target = scheduler.get_velocity(sch_state, x0, noise, timesteps)
        else:
            target = noise
        return jnp.mean((pred - target) ** 2)

    return eval_loss


def run_validation(eval_loss_jit, lora, val_batches: Iterable[dict],
                   seed: int = 0) -> Dict[str, float]:
    """Average the deterministic eval loss over the held-out set."""
    losses = []
    for i, batch in enumerate(val_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        losses.append(float(eval_loss_jit(lora, batch,
                                          jax.random.PRNGKey(seed + i))))
    return {"val_loss": float(np.mean(losses)), "val_samples": len(losses)}


def sanity_check_batch(batch: Dict[str, np.ndarray], step: int = 0) -> str:
    """First-batch shape/mean/std dump (reference training_loop.py:312-321);
    returns the text so callers can both print and log it."""
    lines = [f"Sanity check at step {step} - batch keys: {sorted(batch)}"]
    for key in sorted(batch):
        v = np.asarray(batch[key])
        lines.append(
            f"  {key}: {tuple(v.shape)} {v.dtype}, "
            f"mean {float(v.mean()):.6f}, std {float(v.std()):.6f}"
        )
    return "\n".join(lines)


class MetricsLogger:
    """Append-only jsonl metrics sink, plus a tensorboard event stream when
    torch's SummaryWriter is importable (the reference logs train_loss via
    accelerate's tensorboard tracker, training_loop.py:277)."""

    def __init__(self, path: str, tensorboard: bool = True):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(os.path.dirname(path) or ".", "tb"))
            except Exception:
                pass  # jsonl remains the source of truth

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if isinstance(v, (int, float, np.floating)) or (
                hasattr(v, "shape") and np.ndim(v) == 0) else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, float(v), int(step))
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None
