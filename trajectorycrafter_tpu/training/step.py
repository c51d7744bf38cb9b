"""Diffusion training step (LoRA fine-tuning of the DiT), pjit-ready.

Mirrors the reference latent-space training semantics
(notebooks/05_11_25_training/lora_utils_ours/training_loop.py:90-309):
  * conditioning dropout p=0.1 independently on text / reference / inpaint
    (:162-194) -- dropped conditions become zeros;
  * uniform timestep sampling, q(x_t|x_0) noising, epsilon or v target
    (:197-217);
  * MSE + optional temporal-difference "motion" sub-loss (:242-247);
  * AdamW (optax) with gradient clipping.

The step is a single jit program; with batch sharded on the ``dp`` mesh axis
gradients all-reduce over ICI/DCN automatically (replacing the reference's
accelerate/DeepSpeed/NCCL stack, slurm_train_lora.sh:40-43).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from trajectorycrafter_tpu.training.lora import apply_lora


class TrainState(NamedTuple):
    lora: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   clip_norm: float = 1.0,
                   grad_accum_steps: int = 1) -> optax.GradientTransformation:
    """AdamW with clipping; ``grad_accum_steps`` > 1 averages gradients over
    that many micro-steps before applying one update (the reference's
    ``gradient_accumulation_steps`` knob, lora_utils_ours/config.py, applied
    by accelerate in training_loop.py:261-271)."""
    opt = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )
    if grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum_steps)
    return opt


def make_loss_fn(
    model,
    base_params,
    scheduler,
    sch_state,
    prediction_type: str = "v_prediction",
    cfg_dropout_prob: float = 0.1,
    motion_sub_loss: bool = False,
    lora_alpha: float = 8.0,
    lora_rank: int = 8,
    num_train_timesteps: int = 1000,
) -> Callable:
    """The training objective as loss(lora, batch, rng) -> scalar.

    The ONE implementation of noising + conditioning + target: the train
    step uses it with dropout on, validation (make_eval_loss) with dropout
    off and batch-supplied stratified timesteps -- so val_loss stays
    comparable to train loss by construction.  ``lora=None`` evaluates the
    base params directly.
    """

    def loss_fn(lora, batch, rng):
        params = (apply_lora(base_params, lora, lora_alpha, lora_rank)
                  if lora is not None else base_params)
        k_t, k_n, k_d1, k_d2, k_d3 = jax.random.split(rng, 5)
        x0 = batch["gt_latents"].astype(jnp.float32)
        b = x0.shape[0]

        # timesteps/noise may be supplied in the batch (deterministic eval and
        # the grad-accumulation equivalence test); sampled otherwise
        timesteps = batch.get("timesteps")
        if timesteps is None:
            timesteps = jax.random.randint(k_t, (b,), 0, num_train_timesteps)
        noise = batch.get("noise")
        if noise is None:
            noise = jax.random.normal(k_n, x0.shape, jnp.float32)
        noisy = scheduler.add_noise(sch_state, x0, noise, timesteps)

        # conditioning dropout (reference :162-194); p=0 (validation) skips
        # the draws entirely
        def drop(key, x):
            if cfg_dropout_prob <= 0.0:
                return x
            keep = jax.random.uniform(key, (b,) + (1,) * (x.ndim - 1)) >= cfg_dropout_prob
            return x * keep.astype(x.dtype)

        text = drop(k_d1, batch["prompt_embeds"])
        ref = drop(k_d2, batch["ref_latents"])
        inpaint = drop(k_d3, batch["inpaint_latents"])

        pred = model.apply(
            {"params": params},
            noisy.astype(model.dtype),
            text.astype(model.dtype),
            timesteps.astype(jnp.float32),
            inpaint_latents=inpaint.astype(model.dtype),
            cross_latents=ref.astype(model.dtype),
            image_rotary_emb=batch.get("rope"),
        ).astype(jnp.float32)

        if prediction_type == "v_prediction":
            target = scheduler.get_velocity(sch_state, x0, noise, timesteps)
        else:
            target = noise
        loss = jnp.mean((pred - target) ** 2)
        if motion_sub_loss:
            # temporal-difference alignment (reference :242-247)
            dp = pred[:, 1:] - pred[:, :-1]
            dt = target[:, 1:] - target[:, :-1]
            loss = loss + 0.1 * jnp.mean((dp - dt) ** 2)
        return loss

    return loss_fn


def make_train_step(
    model,
    base_params,
    scheduler,
    sch_state,
    optimizer: optax.GradientTransformation,
    prediction_type: str = "v_prediction",
    cfg_dropout_prob: float = 0.1,
    motion_sub_loss: bool = False,
    lora_alpha: float = 8.0,
    lora_rank: int = 8,
    num_train_timesteps: int = 1000,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: dict with keys (channel-last latents, already VAE-encoded):
      gt_latents (B,F,h,w,C), prompt_embeds (B,L,De), ref_latents (B,Fr,h,w,C),
      inpaint_latents (B,F,h,w,C+1), rope (optional tuple).
    """
    loss_fn = make_loss_fn(
        model, base_params, scheduler, sch_state,
        prediction_type=prediction_type, cfg_dropout_prob=cfg_dropout_prob,
        motion_sub_loss=motion_sub_loss, lora_alpha=lora_alpha,
        lora_rank=lora_rank, num_train_timesteps=num_train_timesteps,
    )

    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.lora, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(lora=lora, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step
