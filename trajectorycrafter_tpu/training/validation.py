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
    # TAE over valid pixels only: unnormalize_depth keeps invalid pixels at
    # exactly 0, and a 0 -> d transition would contribute d/1e-6 to the mean
    tae_valid = (pred[1:] > 0) & (pred[:-1] > 0)
    tae_rel = jnp.abs(pred[1:] - pred[:-1]) / jnp.maximum(pred[:-1], 1e-6)
    tae_n = jnp.sum(tae_valid)
    out = {
        "overall_rel_error": relative_depth_error(pred, gt,
                                                  jnp.ones_like(inpainted)),
        "inpainted_rel_error": relative_depth_error(pred, gt, inpainted),
        "non_inpainted_rel_error": relative_depth_error(pred, gt, ~inpainted),
        "tae": jnp.where(tae_n > 0,
                         jnp.sum(jnp.where(tae_valid, tae_rel, 0.0)) / tae_n,
                         jnp.nan),
        "inpainted_pixels": jnp.sum(inpainted),
        "non_inpainted_pixels": jnp.sum(~inpainted),
    }
    return {k: float(v) for k, v in out.items()}


def make_eval_loss(model, base_params, scheduler, sch_state,
                   prediction_type: str = "v_prediction",
                   lora_alpha: float = 8.0, lora_rank: int = 8,
                   num_train_timesteps: int = 1000) -> Callable:
    """Deterministic held-out loss: the SAME compiled objective as the train
    step (training.step.make_loss_fn -- one implementation, no drift) with
    conditioning dropout off.  ``run_validation`` stratifies timesteps over
    the whole held-out set via ``batch["timesteps"]``."""
    from trajectorycrafter_tpu.training.step import make_loss_fn

    return make_loss_fn(
        model, base_params, scheduler, sch_state,
        prediction_type=prediction_type, cfg_dropout_prob=0.0,
        motion_sub_loss=False, lora_alpha=lora_alpha, lora_rank=lora_rank,
        num_train_timesteps=num_train_timesteps,
    )


def run_validation(eval_loss_jit, lora, val_batches: Iterable[dict],
                   seed: int = 0,
                   num_train_timesteps: int = 1000) -> Dict[str, float]:
    """Average the deterministic eval loss over the held-out set.

    Timesteps are stratified over the *whole* set (sample i of n gets
    t = i/(n-1) of the schedule), not within each batch -- per-sample
    batches of size 1 would otherwise all evaluate at timestep 0.
    """
    val_batches = [dict(b) for b in val_batches]
    if not val_batches:
        raise ValueError("run_validation got an empty validation set")
    sizes = [np.asarray(b["gt_latents"]).shape[0] for b in val_batches]
    total = sum(sizes)
    pos = 0
    losses = []
    for i, batch in enumerate(val_batches):
        if "timesteps" not in batch:
            if total == 1:  # single sample: mid-schedule, not t=0
                ts = np.array([(num_train_timesteps - 1) // 2])
            else:
                ts = np.round(np.arange(pos, pos + sizes[i])
                              * (num_train_timesteps - 1) / (total - 1))
            batch["timesteps"] = ts.astype(np.int32)
        pos += sizes[i]
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
            if isinstance(v, (int, float, np.floating)) or (
                    hasattr(v, "shape") and np.ndim(v) == 0):
                rec[k] = float(v)
            elif hasattr(v, "shape"):  # non-scalar array: keep json-able
                rec[k] = np.asarray(v).tolist()
            else:
                rec[k] = v
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
