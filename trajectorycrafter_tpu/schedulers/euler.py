"""Euler discrete + Euler ancestral samplers (sigma parametrisation).

EulerDiscrete is both a sampler-menu option ('Euler', reference demo.py:648)
and the scheduler DepthCrafter inherits from the SVD pipeline shell
(reference models/infer.py:26-31): continuous 0.25*log(sigma) timesteps,
Karras sigma spacing, v-prediction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.schedulers.betas import (
    make_betas,
    rescale_zero_terminal_snr,
    spaced_timesteps,
)


class EulerState(NamedTuple):
    timesteps: jnp.ndarray  # (S,) model-facing timesteps (may be continuous)
    sigmas: jnp.ndarray  # (S+1,) trailing zero
    init_noise_sigma: jnp.ndarray
    alphas_cumprod: jnp.ndarray


def karras_sigmas(sigma_min: float, sigma_max: float, n: int, rho: float = 7.0) -> np.ndarray:
    ramp = np.linspace(0, 1, n)
    inv_rho = 1.0 / rho
    return (sigma_max**inv_rho + ramp * (sigma_min**inv_rho - sigma_max**inv_rho)) ** rho


class EulerDiscreteScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "leading",
        timestep_type: str = "discrete",  # 'discrete' | 'continuous' (SVD)
        interpolation_type: str = "linear",
        use_karras_sigmas: bool = False,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        steps_offset: int = 1,
        rescale_betas_zero_snr: bool = False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.timestep_type = timestep_type
        self.interpolation_type = interpolation_type
        self.use_karras_sigmas = use_karras_sigmas
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.steps_offset = steps_offset

        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        abar = np.cumprod(1.0 - betas)
        if rescale_betas_zero_snr:
            # zero-terminal-SNR shift, then keep the terminal sigma finite
            # (diffusers scheduling_euler_discrete: alphas_cumprod[-1] = 2^-24)
            abar = rescale_zero_terminal_snr(abar)
            abar[-1] = 2.0**-24
        self.alphas_cumprod = abar.astype(np.float64)
        self.train_sigmas = np.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)

    def set_timesteps(self, num_inference_steps: int) -> EulerState:
        ts = spaced_timesteps(
            num_inference_steps,
            self.num_train_timesteps,
            self.timestep_spacing,
            self.steps_offset,
        ).astype(np.float64)

        if self.interpolation_type == "linear":
            sigmas = np.interp(ts, np.arange(len(self.train_sigmas)), self.train_sigmas)
        elif self.interpolation_type == "log_linear":
            sigmas = np.exp(
                np.linspace(
                    np.log(self.train_sigmas[-1]), np.log(self.train_sigmas[0]),
                    num_inference_steps + 1,
                )
            )[::-1][: num_inference_steps]
        else:
            raise ValueError(self.interpolation_type)

        if self.use_karras_sigmas:
            smin = self.sigma_min if self.sigma_min is not None else float(sigmas[-1])
            smax = self.sigma_max if self.sigma_max is not None else float(sigmas[0])
            sigmas = karras_sigmas(smin, smax, num_inference_steps)
            # map back to (possibly continuous) timesteps
            log_train = np.log(self.train_sigmas)
            ts = np.array([
                np.interp(np.log(s), log_train, np.arange(len(log_train))) for s in sigmas
            ])

        if self.timestep_type == "continuous":
            timesteps = 0.25 * np.log(sigmas)
        else:
            timesteps = ts

        if self.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        sigmas = np.concatenate([sigmas, [0.0]])
        return EulerState(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, jnp.float32),
        )

    def scale_model_input(self, state: EulerState, sample, i):
        sigma = state.sigmas[i]
        return sample / jnp.sqrt(sigma**2 + 1)

    def _denoised(self, state, model_output, sample, i):
        sigma = state.sigmas[i]
        if self.prediction_type == "epsilon":
            return sample - sigma * model_output
        if self.prediction_type == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (sigma**2 + 1)
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(self.prediction_type)

    def step(self, state: EulerState, model_output, i, sample, noise=None):
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        sigma = state.sigmas[i]
        denoised = self._denoised(state, model_output, sample, i)
        derivative = (sample - denoised) / sigma
        dt = state.sigmas[i + 1] - sigma
        return (sample + derivative * dt).astype(dtype)

    def add_noise(self, state: EulerState, original, noise, timesteps):
        """Sigma-space noising x = x0 + sigma(t)*n at model-facing timestep
        values (matching the other schedulers' timestep-valued add_noise and
        diffusers scheduling_euler_discrete, which looks the sigma up by
        timestep -- used by the pipeline's img2img strength leg)."""
        t = jnp.asarray(timesteps, jnp.float32)
        if self.timestep_type == "continuous":
            sigma = jnp.exp(4.0 * t)  # t = 0.25*log(sigma)
        else:
            train_sigmas = jnp.asarray(self.train_sigmas, jnp.float32)
            sigma = jnp.interp(
                t, jnp.arange(len(train_sigmas), dtype=jnp.float32), train_sigmas
            )
        while sigma.ndim < jnp.ndim(original):
            sigma = sigma[..., None]
        return original + sigma * noise


class EulerAncestralDiscreteScheduler(EulerDiscreteScheduler):
    """Ancestral variant ('Euler A'): stochastic sigma_up/sigma_down split."""

    def step(self, state: EulerState, model_output, i, sample, noise=None):
        assert noise is not None, "Euler ancestral requires per-step noise"
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        sigma = state.sigmas[i]
        sigma_next = state.sigmas[i + 1]
        denoised = self._denoised(state, model_output, sample, i)
        var_up = sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-20)
        sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
        derivative = (sample - denoised) / sigma
        prev = sample + derivative * (sigma_down - sigma)
        return (prev + noise.astype(jnp.float32) * sigma_up).astype(dtype)
