"""DDIM samplers (plain + CogVideoX variant) as jit/scan-friendly functions.

Semantics match the two samplers the reference selects between
('DDIM_Origin' -> diffusers DDIMScheduler, 'DDIM_Cog' -> CogVideoXDDIMScheduler;
reference demo.py:647-657).  Per-step coefficients are precomputed into a
``DDIMState`` pytree at ``set_timesteps`` so the 50-step denoise loop compiles
into a single ``lax.fori_loop`` with array indexing -- no Python-level
scheduler state mutation as in the torch stack.

Notable parity detail: 'DDIM_Origin' (plain DDIM) *ignores* the checkpoint's
``snr_shift_scale=3.0`` config field; only the Cog variant applies the
SNR shift.  Both honour rescale_betas_zero_snr + v-prediction + trailing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.schedulers.betas import (
    make_betas,
    rescale_zero_terminal_snr,
    snr_shift,
    spaced_timesteps,
)


class DDIMState(NamedTuple):
    timesteps: jnp.ndarray  # (S,) int32, descending
    alpha_prod_t: jnp.ndarray  # (S,)
    alpha_prod_prev: jnp.ndarray  # (S,)
    alphas_cumprod: jnp.ndarray  # (T,) full table (for add_noise / img2img)
    init_noise_sigma: jnp.ndarray  # scalar


class DDIMScheduler:
    """diffusers-compatible DDIM; prediction_type epsilon|v_prediction|sample."""

    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "trailing",
        rescale_betas_zero_snr: bool = True,
        snr_shift_scale: Optional[float] = None,  # used only by the Cog subclass
    ):
        self.num_train_timesteps = num_train_timesteps
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        self.set_alpha_to_one = set_alpha_to_one
        self.steps_offset = steps_offset
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing

        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)
        if snr_shift_scale is not None:
            alphas_cumprod = snr_shift(alphas_cumprod, snr_shift_scale)
        if rescale_betas_zero_snr:
            alphas_cumprod = rescale_zero_terminal_snr(alphas_cumprod)
        self.alphas_cumprod = alphas_cumprod.astype(np.float32)
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])

    # -- schedule construction -------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        ts = spaced_timesteps(
            num_inference_steps,
            self.num_train_timesteps,
            self.timestep_spacing,
            self.steps_offset,
        )
        prev_ts = ts - self.num_train_timesteps // num_inference_steps
        alpha_t = self.alphas_cumprod[ts]
        alpha_prev = np.where(
            prev_ts >= 0,
            self.alphas_cumprod[np.clip(prev_ts, 0, None)],
            self.final_alpha_cumprod,
        )
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_prod_t=jnp.asarray(alpha_t, jnp.float32),
            alpha_prod_prev=jnp.asarray(alpha_prev, jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
        )

    # -- per-step ops (all jittable, i is a traced index) ----------------------
    def scale_model_input(self, state: DDIMState, sample: jnp.ndarray, i) -> jnp.ndarray:
        return sample

    def _predict_x0_eps(self, state, model_output, sample, i):
        a_t = state.alpha_prod_t[i]
        b_t = 1.0 - a_t
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(b_t) * model_output) / jnp.sqrt(a_t)
            eps = model_output
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * model_output
            eps = jnp.sqrt(a_t) * model_output + jnp.sqrt(b_t) * sample
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(b_t)
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
            eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(b_t)
        return x0, eps

    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        i,
        sample: jnp.ndarray,
        eta: float = 0.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x_t -> x_{t-1} (deterministic for eta=0, the reference default)."""
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a_t = state.alpha_prod_t[i]
        a_prev = state.alpha_prod_prev[i]
        x0, eps = self._predict_x0_eps(state, model_output, sample, i)

        if eta > 0.0:
            var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
            std = eta * jnp.sqrt(var)
        else:
            std = 0.0
        direction = jnp.sqrt(1.0 - a_prev - std**2) * eps
        prev = jnp.sqrt(a_prev) * x0 + direction
        if eta > 0.0:
            assert noise is not None, "eta > 0 requires noise"
            prev = prev + std * noise
        return prev.astype(dtype)

    # -- training / img2img helpers -------------------------------------------
    def add_noise(self, state: DDIMState, original, noise, timesteps):
        a = state.alphas_cumprod[timesteps].astype(jnp.float32)
        while a.ndim < original.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, state: DDIMState, sample, noise, timesteps):
        a = state.alphas_cumprod[timesteps].astype(jnp.float32)
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample


class CogVideoXDDIMScheduler(DDIMScheduler):
    """DDIM with the CogVideoX SNR shift applied to alphas_cumprod."""

    def __init__(self, *args, snr_shift_scale: float = 3.0, **kwargs):
        super().__init__(*args, snr_shift_scale=snr_shift_scale, **kwargs)
