"""PNDM sampler -- pseudo-numerical methods (Runge-Kutta warmup + PLMS).

'PNDM' option of the reference sampler menu (demo.py:651).  The reference
loads diffusers' PNDMScheduler from the CogVideoX-Fun checkpoint config:
the config carries no ``skip_prk_steps`` key, so the diffusers default
(False) applies and the deployed sampler runs the full pseudo-RK4 warmup
(3 RK steps x 4 model evals over the first schedule intervals) before
switching to 4th-order Adams-Bashforth PLMS.  ``skip_prk_steps=True``
keeps the Stable-Diffusion-style PLMS-only form (duplicated second
timestep, Heun-style warmup) for configs that set it.

Faithful diffusers semantics worth noting: the linear-multistep/RK
combinations are taken on the *raw* model outputs, and the v->epsilon
conversion happens once, inside the x_{t-1} formula, at the (possibly
overridden) effective timestep with the integration-base sample -- NOT
per-output before combining.

State (output history, counter, stashed sample, RK accumulator) is
threaded functionally so the loop lives inside one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.schedulers.betas import make_betas, spaced_timesteps

PRK_CALLS = 12  # 3 pseudo-RK4 steps x 4 model evaluations


class PNDMState(NamedTuple):
    timesteps: jnp.ndarray  # (L,) model-facing timesteps per loop entry
    alpha_prod_t: jnp.ndarray  # (L,) abar at each entry's *effective* timestep
    alpha_prod_prev: jnp.ndarray  # (L,) abar at that entry's target timestep
    alphas_cumprod: jnp.ndarray
    init_noise_sigma: jnp.ndarray


class PNDMLoopState(NamedTuple):
    """Per-sample mutable carry for the PRK/PLMS loop."""

    ets: jnp.ndarray  # (4, *shape) raw model-output history, newest last
    counter: jnp.ndarray  # int32 completed model calls
    cur_sample: jnp.ndarray  # stashed integration-base sample
    acc: jnp.ndarray  # RK accumulator (diffusers cur_model_output)


class PNDMScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "trailing",
        steps_offset: int = 0,
        set_alpha_to_one: bool = True,
        skip_prk_steps: bool = False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.skip_prk_steps = skip_prk_steps
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float64)
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])

    def set_timesteps(self, num_inference_steps: int) -> PNDMState:
        base = spaced_timesteps(
            num_inference_steps, self.num_train_timesteps, self.timestep_spacing, self.steps_offset
        )  # descending, length S
        delta = self.num_train_timesteps // num_inference_steps

        if self.skip_prk_steps:
            # PLMS-only: descending with the second timestep duplicated
            ts = np.concatenate([base[:1], base[1:2], base[1:]])
            tgt = ts - delta
            src = ts.copy()
            # warmup second half: integrate from ts[1]+delta down to ts[1]
            # (diffusers step_plms counter==1: prev=t, t=t+delta)
            src[1] = ts[1] + delta
            tgt[1] = ts[1]
        else:
            if num_inference_steps < 4:
                raise ValueError("PRK warmup needs num_inference_steps >= 4")
            asc = base[::-1]
            delta2 = delta // 2
            # diffusers set_timesteps: last 4 ascending timesteps -> 12 RK evals
            prk = np.repeat(asc[-4:], 2) + np.tile(np.array([0, delta2]), 4)
            prk = np.repeat(prk[:-1], 2)[1:-1][::-1].copy()
            plms = asc[:-3][::-1].copy()
            ts = np.concatenate([prk, plms])
            src = ts.copy()
            tgt = np.empty_like(ts)
            for i in range(PRK_CALLS):
                # step_prk: effective t is the RK step's start; the target
                # alternates half-step / hold (counter parity)
                src[i] = prk[(i // 4) * 4]
                tgt[i] = prk[i] - (delta2 if i % 2 == 0 else 0)
            tgt[PRK_CALLS:] = plms - delta

        alpha_t = self.alphas_cumprod[src]
        alpha_prev = np.where(
            tgt >= 0, self.alphas_cumprod[np.clip(tgt, 0, None)], self.final_alpha_cumprod
        )
        return PNDMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_prod_t=jnp.asarray(alpha_t, jnp.float32),
            alpha_prod_prev=jnp.asarray(alpha_prev, jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, jnp.float32),
            init_noise_sigma=jnp.asarray(1.0, jnp.float32),
        )

    def num_loop_steps(self, num_inference_steps: int) -> int:
        if self.skip_prk_steps:
            return num_inference_steps + 1
        return PRK_CALLS + (num_inference_steps - 3)

    def init_loop_state(self, sample_shape, dtype=jnp.float32) -> PNDMLoopState:
        return PNDMLoopState(
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
            counter=jnp.asarray(0, jnp.int32),
            cur_sample=jnp.zeros(sample_shape, dtype),
            acc=jnp.zeros(sample_shape, dtype),
        )

    def scale_model_input(self, state, sample, i):
        return sample

    def _prev_sample(self, state, sample, i, model_output):
        """x_{t-1} formula (diffusers _get_prev_sample), converting
        v-prediction once at the effective timestep with the base sample."""
        a_t = state.alpha_prod_t[i]
        a_prev = state.alpha_prod_prev[i]
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        if self.prediction_type == "v_prediction":
            model_output = jnp.sqrt(a_t) * model_output + jnp.sqrt(b_t) * sample
        elif self.prediction_type != "epsilon":
            raise ValueError(self.prediction_type)
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
        return sample_coeff * sample - (a_prev - a_t) * model_output / denom

    def step(
        self,
        state: PNDMState,
        model_output: jnp.ndarray,
        i,
        sample: jnp.ndarray,
        loop: PNDMLoopState,
    ):
        """One loop entry (the loop has ``num_loop_steps`` entries).

        Returns (prev_sample, new_loop)."""
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        n = loop.counter
        pushed = jnp.concatenate([loop.ets[1:], mo[None]], axis=0)

        if self.skip_prk_steps:
            # history push on every call except the warmup's second (n==1)
            ets = jnp.where(n == 1, loop.ets, pushed)
            e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
            combo = jnp.where(
                n == 0,
                mo,
                jnp.where(
                    n == 1,
                    (mo + e1) / 2.0,  # average with the stashed first output
                    jnp.where(
                        n == 2,
                        (3 * e1 - e2) / 2,
                        jnp.where(
                            n == 3,
                            (23 * e1 - 16 * e2 + 5 * e3) / 12,
                            (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24,
                        ),
                    ),
                ),
            )
            cur_sample = jnp.where(n == 0, sample, loop.cur_sample)
            base = jnp.where(n == 1, cur_sample, sample)
            prev = self._prev_sample(state, base, i, combo)
            new_loop = PNDMLoopState(
                ets=ets, counter=n + 1, cur_sample=cur_sample, acc=loop.acc
            )
            return prev.astype(dtype), new_loop

        # --- PRK warmup (counters 0..11), then 4th-order PLMS ------------
        in_prk = n < PRK_CALLS
        m = n % 4
        # raw-output history: PRK pushes at each RK step's first eval,
        # PLMS pushes every call
        push = jnp.logical_or(~in_prk, m == 0)
        ets = jnp.where(push, pushed, loop.ets)

        # RK accumulator: +1/6, +1/3, +1/3, +1/6 (the m==3 sum is the full
        # RK4 combination, then the accumulator resets)
        contrib = jnp.where(jnp.logical_or(m == 0, m == 3), mo / 6.0, mo / 3.0)
        acc_new = loop.acc + contrib
        reset = jnp.logical_and(in_prk, m == 3)
        acc_out = jnp.where(reset, jnp.zeros_like(acc_new),
                            jnp.where(in_prk, acc_new, loop.acc))

        cur_sample = jnp.where(
            jnp.logical_and(in_prk, m == 0), sample, loop.cur_sample
        )

        e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
        ab4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24.0
        mo_prk = jnp.where(m == 3, acc_new, mo)
        combo = jnp.where(in_prk, mo_prk, ab4)
        base = jnp.where(in_prk, cur_sample, sample)

        prev = self._prev_sample(state, base, i, combo)
        new_loop = PNDMLoopState(
            ets=ets, counter=n + 1, cur_sample=cur_sample, acc=acc_out
        )
        return prev.astype(dtype), new_loop

    def add_noise(self, state, original, noise, timesteps):
        a = state.alphas_cumprod[timesteps].astype(jnp.float32)
        while a.ndim < original.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
