"""PNDM (PLMS) sampler -- linear-multistep pseudo-numerical method.

'PNDM' option of the reference sampler menu (demo.py:651), in the skip-prk
(PLMS-only) form these checkpoints configure.  Faithful to the published
algorithm: the second timestep is duplicated and the first two model calls
form a Heun-style warmup (average of the two epsilons, stepped from the
stashed first sample); afterwards 2nd/3rd/4th-order Adams-Bashforth
combinations of the epsilon history are used.

State (epsilon history, counter, stashed sample) is threaded functionally so
the loop can live inside one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from trajectorycrafter_tpu.schedulers.betas import make_betas, spaced_timesteps


class PNDMState(NamedTuple):
    timesteps: jnp.ndarray  # (S+1,) descending, second entry duplicated
    alpha_prod_t: jnp.ndarray  # (S+1,) abar at each loop entry's timestep
    alpha_prod_prev: jnp.ndarray  # (S+1,) abar at that entry's target timestep
    alphas_cumprod: jnp.ndarray
    init_noise_sigma: jnp.ndarray


class PNDMLoopState(NamedTuple):
    """Per-sample mutable carry for the PLMS loop."""

    ets: jnp.ndarray  # (4, *shape) epsilon history, newest last
    counter: jnp.ndarray  # int32 completed model calls
    cur_sample: jnp.ndarray  # stashed sample for the warmup second half


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
        set_alpha_to_one: bool = False,
        skip_prk_steps: bool = True,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float64)
        self.final_alpha_cumprod = 1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])

    def set_timesteps(self, num_inference_steps: int) -> PNDMState:
        base = spaced_timesteps(
            num_inference_steps, self.num_train_timesteps, self.timestep_spacing, self.steps_offset
        )  # descending, length S
        delta = self.num_train_timesteps // num_inference_steps
        # duplicate the second timestep (PLMS warmup re-evaluation)
        ts = np.concatenate([base[:1], base[1:2], base[1:]])
        # target timestep of each loop entry; the warmup's second call (index 1)
        # integrates from the *first* timestep again
        tgt = ts - delta
        tgt[1] = base[0] - delta
        src = ts.copy()
        src[1] = base[0]

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
        return num_inference_steps + 1

    def init_loop_state(self, sample_shape, dtype=jnp.float32) -> PNDMLoopState:
        return PNDMLoopState(
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
            counter=jnp.asarray(0, jnp.int32),
            cur_sample=jnp.zeros(sample_shape, dtype),
        )

    def scale_model_input(self, state, sample, i):
        return sample

    def _to_epsilon(self, state, model_output, sample, i):
        a_t = state.alpha_prod_t[i]
        b_t = 1.0 - a_t
        if self.prediction_type == "epsilon":
            return model_output
        if self.prediction_type == "v_prediction":
            return jnp.sqrt(a_t) * model_output + jnp.sqrt(b_t) * sample
        raise ValueError(self.prediction_type)

    def _prev_sample(self, state, sample, i, eps):
        a_t = state.alpha_prod_t[i]
        a_prev = state.alpha_prod_prev[i]
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
        eps_coeff = (a_prev - a_t) / denom
        return sample_coeff * sample - eps_coeff * eps

    def step(
        self,
        state: PNDMState,
        model_output: jnp.ndarray,
        i,
        sample: jnp.ndarray,
        loop: PNDMLoopState,
    ):
        """One PLMS loop entry (loop has S+1 entries).  Returns (prev, loop)."""
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        eps = self._to_epsilon(state, model_output.astype(jnp.float32), sample, i)
        n = loop.counter

        # history push happens on every call except the warmup's second (n==1)
        pushed = jnp.concatenate([loop.ets[1:], eps[None]], axis=0)
        ets = jnp.where(n == 1, loop.ets, pushed)

        e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
        warm0 = eps
        warm1 = (eps + e1) / 2.0  # average with the stashed first epsilon
        lin2 = (3 * e1 - e2) / 2
        lin3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        lin4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24
        eps_prime = jnp.where(
            n == 0,
            warm0,
            jnp.where(
                n == 1,
                warm1,
                jnp.where(n == 2, lin2, jnp.where(n == 3, lin3, lin4)),
            ),
        )

        # the warmup's second call integrates from the stashed first sample
        cur_sample = jnp.where(n == 0, sample, loop.cur_sample)
        base = jnp.where(n == 1, cur_sample, sample)

        prev = self._prev_sample(state, base, i, eps_prime)
        new_loop = PNDMLoopState(ets=ets, counter=n + 1, cur_sample=cur_sample)
        return prev.astype(dtype), new_loop

    def add_noise(self, state, original, noise, timesteps):
        a = state.alphas_cumprod[timesteps].astype(jnp.float32)
        while a.ndim < original.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise
