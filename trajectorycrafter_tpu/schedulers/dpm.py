"""DPM-Solver++ (2M) multistep sampler + the CogVideoX two-sample DPM variant.

'DPM++' in the reference sampler menu (demo.py:650) and the
``CogVideoXDPMScheduler`` whose ``step`` consumes the previous step's
x0 prediction (reference pipeline_trajectorycrafter.py:1169-1177).

State threads the previous x0 prediction through the scan carry instead of
mutating Python attributes, so the whole sampling loop stays one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.schedulers.betas import (
    make_betas,
    rescale_zero_terminal_snr,
    snr_shift,
    spaced_timesteps,
)


class DPMState(NamedTuple):
    timesteps: jnp.ndarray  # (S,)
    alpha_t: jnp.ndarray  # (S+1,) sqrt(abar) at each step boundary (last=1)
    sigma_t: jnp.ndarray  # (S+1,) sqrt(1-abar)
    lambda_t: jnp.ndarray  # (S+1,) log(alpha/sigma)
    alphas_cumprod: jnp.ndarray
    init_noise_sigma: jnp.ndarray


class DPMSolverMultistepScheduler:
    """DPM-Solver++ 2M (midpoint, lower-order final), data-prediction form."""

    order = 1  # diffusers exposes order=1 for multistep (one model call/step)

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "trailing",
        steps_offset: int = 0,
        solver_order: int = 2,
        rescale_betas_zero_snr: bool = True,
        snr_shift_scale: Optional[float] = None,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.solver_order = solver_order

        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        abar = np.cumprod(1.0 - betas)
        if snr_shift_scale is not None:
            abar = snr_shift(abar, snr_shift_scale)
        if rescale_betas_zero_snr:
            abar = rescale_zero_terminal_snr(abar)
            # keep lambda finite at the zero-SNR terminal step
            abar[-1] = max(abar[-1], 2**-24)
        self.alphas_cumprod = abar.astype(np.float64)

    def set_timesteps(self, num_inference_steps: int) -> DPMState:
        ts = spaced_timesteps(
            num_inference_steps, self.num_train_timesteps, self.timestep_spacing, self.steps_offset
        )
        abar_steps = self.alphas_cumprod[ts]
        alpha = np.sqrt(abar_steps)
        sigma = np.sqrt(1 - abar_steps)
        # boundary at the end of sampling: fully denoised
        alpha = np.concatenate([alpha, [1.0]])
        sigma = np.concatenate([sigma, [1e-12]])
        lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-12))
        return DPMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_t=jnp.asarray(alpha, jnp.float32),
            sigma_t=jnp.asarray(sigma, jnp.float32),
            lambda_t=jnp.asarray(lam, jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
        )

    def scale_model_input(self, state, sample, i):
        return sample

    def _predict_x0(self, state, model_output, sample, i):
        a, s = state.alpha_t[i], state.sigma_t[i]
        if self.prediction_type == "epsilon":
            return (sample - s * model_output) / a
        if self.prediction_type == "v_prediction":
            return a * sample - s * model_output
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(self.prediction_type)

    def step(self, state: DPMState, model_output, i, sample, prev_x0=None,
             num_steps=None, first_index=0):
        """One 2M update.  ``prev_x0`` is last step's x0 (None/zeros at the
        first executed step).  ``first_index`` is the loop's starting step
        (img2img strength truncation): the first *executed* step must be
        first-order (diffusers' lower_order_nums warmup counts executed
        steps, not absolute indices).

        Returns (new_sample, x0) -- thread x0 into the next call.
        """
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        x0 = self._predict_x0(state, model_output.astype(jnp.float32), sample, i)

        lam_s, lam_t = state.lambda_t[i], state.lambda_t[i + 1]
        a_t, s_t, s_s = state.alpha_t[i + 1], state.sigma_t[i + 1], state.sigma_t[i]
        h = lam_t - lam_s
        first_order = (s_t / s_s) * sample - a_t * jnp.expm1(-h) * x0

        if prev_x0 is None:
            return first_order.astype(dtype), x0

        lam_prev = state.lambda_t[jnp.maximum(i - 1, 0)]
        h_prev = lam_s - lam_prev
        r = h_prev / h
        d1 = (x0 - prev_x0) / r
        second_order = first_order - 0.5 * a_t * jnp.expm1(-h) * d1

        is_second = i > first_index
        if num_steps is not None:  # lower_order_final (final sigma is zero)
            is_second = jnp.logical_and(is_second, i < num_steps - 1)
        out = jnp.where(is_second, second_order, first_order)
        return out.astype(dtype), x0

    def add_noise(self, state, original, noise, timesteps):
        a = state.alphas_cumprod[timesteps].astype(jnp.float32)
        while a.ndim < original.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


class CogVideoXDPMScheduler(DPMSolverMultistepScheduler):
    """DPM++ with the CogVideoX SNR shift; matches the two-sample step
    interface used by the reference denoise loop (pipeline:1169-1177)."""

    def __init__(self, *args, snr_shift_scale: float = 3.0, **kwargs):
        super().__init__(*args, snr_shift_scale=snr_shift_scale, **kwargs)
