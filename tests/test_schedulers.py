"""Scheduler correctness tests.

Strategy: (a) closed-form golden checks of the DDIM update against the
published formula; (b) oracle-denoiser consistency -- when the model returns
the exact noise residual for a known clean sample x0, the full sampling loop
must recover x0 up to float error; (c) schedule-table checks (trailing
spacing, zero-terminal-SNR, SNR shift).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.schedulers import (
    CogVideoXDDIMScheduler,
    CogVideoXDPMScheduler,
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
)
from trajectorycrafter_tpu.schedulers.betas import spaced_timesteps


def test_trailing_spacing_50():
    ts = spaced_timesteps(50, 1000, "trailing")
    assert ts[0] == 999 and ts[-1] == 19 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_leading_spacing():
    ts = spaced_timesteps(50, 1000, "leading", steps_offset=0)
    assert ts[0] == 980 and ts[-1] == 0


def test_zero_terminal_snr():
    s = DDIMScheduler(rescale_betas_zero_snr=True)
    assert s.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-10)
    s2 = DDIMScheduler(rescale_betas_zero_snr=False)
    assert s2.alphas_cumprod[-1] > 0


def test_snr_shift_applied_only_in_cog_variant():
    plain = DDIMScheduler(rescale_betas_zero_snr=False)
    cog = CogVideoXDDIMScheduler(rescale_betas_zero_snr=False)
    # shift lowers alphas_cumprod (snr / 3)
    assert cog.alphas_cumprod[500] < plain.alphas_cumprod[500]


def test_ddim_step_matches_closed_form(rng):
    sch = DDIMScheduler(prediction_type="epsilon", rescale_betas_zero_snr=False)
    state = sch.set_timesteps(10)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 3, 4)).astype(np.float32)
    i = 3
    got = np.asarray(sch.step(state, jnp.asarray(eps), i, jnp.asarray(x)))
    a_t = float(state.alpha_prod_t[i])
    a_p = float(state.alpha_prod_prev[i])
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    want = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ddim_one_step_full_denoise_vpred(rng):
    """With 1 trailing step and v-prediction, step() returns x0 exactly."""
    sch = DDIMScheduler(prediction_type="v_prediction")
    state = sch.set_timesteps(1)
    assert int(state.timesteps[0]) == 999
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    noise = rng.standard_normal((4, 4)).astype(np.float32)
    t = state.timesteps[0]
    xt = sch.add_noise(state, jnp.asarray(x0), jnp.asarray(noise), t)
    v = sch.get_velocity(state, jnp.asarray(x0), jnp.asarray(noise), t)
    out = np.asarray(sch.step(state, v, 0, xt))
    np.testing.assert_allclose(out, x0, atol=1e-4)


def _oracle_loop_ddim(sch, steps, x0, noise):
    state = sch.set_timesteps(steps)
    x = sch.add_noise(state, x0, noise, state.timesteps[0])
    for i in range(steps):
        t = state.timesteps[i]
        a = state.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        if sch.prediction_type == "v_prediction":
            model_out = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        else:
            model_out = eps
        x = sch.step(state, model_out, i, x)
    return np.asarray(x)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_ddim_oracle_recovers_x0(rng, pred):
    sch = DDIMScheduler(prediction_type=pred, rescale_betas_zero_snr=False)
    x0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    out = _oracle_loop_ddim(sch, 20, x0, noise)
    np.testing.assert_allclose(out, np.asarray(x0), atol=1e-3)


def test_euler_oracle_recovers_x0(rng):
    sch = EulerDiscreteScheduler(prediction_type="epsilon", timestep_spacing="trailing")
    steps = 30
    state = sch.set_timesteps(steps)
    x0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    x = x0 + state.sigmas[0] * noise
    for i in range(steps):
        eps = (x - x0) / state.sigmas[i]
        x = sch.step(state, eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_euler_add_noise_timestep_valued(rng):
    """Euler add_noise takes model-facing timesteps (like DDIM/DPM/PNDM):
    at an in-schedule timestep it must equal x0 + state.sigmas[step]*n."""
    sch = EulerDiscreteScheduler(prediction_type="epsilon", timestep_spacing="trailing")
    state = sch.set_timesteps(10)
    x0 = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    for step in (0, 4):
        got = sch.add_noise(state, x0, n, state.timesteps[step])
        want = x0 + state.sigmas[step] * n
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    # continuous (SVD/DepthCrafter) timestep type: t = 0.25*log(sigma)
    svd = EulerDiscreteScheduler(
        prediction_type="v_prediction", timestep_type="continuous",
        use_karras_sigmas=True, sigma_min=0.002, sigma_max=700.0,
        timestep_spacing="leading",
    )
    st = svd.set_timesteps(5)
    got = svd.add_noise(st, x0, n, st.timesteps[0])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x0 + st.sigmas[0] * n), rtol=1e-4)


def test_euler_continuous_karras_svd_config():
    """SVD/DepthCrafter configuration: continuous 0.25*log(sigma) timesteps."""
    sch = EulerDiscreteScheduler(
        prediction_type="v_prediction",
        timestep_type="continuous",
        use_karras_sigmas=True,
        sigma_min=0.002,
        sigma_max=700.0,
        timestep_spacing="leading",
    )
    state = sch.set_timesteps(5)
    sig = np.asarray(state.sigmas)
    assert sig[0] == pytest.approx(700.0, rel=1e-5)
    assert sig[4] == pytest.approx(0.002, rel=1e-3)
    assert sig[5] == 0.0
    np.testing.assert_allclose(np.asarray(state.timesteps), 0.25 * np.log(sig[:5]), rtol=1e-5)
    # leading spacing -> init_noise_sigma = sqrt(sigma_max^2+1)
    assert float(state.init_noise_sigma) == pytest.approx(np.sqrt(700.0**2 + 1), rel=1e-6)


def test_euler_ancestral_zero_terminal_noise(rng):
    sch = EulerAncestralDiscreteScheduler(prediction_type="epsilon", timestep_spacing="trailing")
    steps = 10
    state = sch.set_timesteps(steps)
    x0 = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    x = x0 + state.sigmas[0] * noise
    for i in range(steps):
        eps = (x - x0) / state.sigmas[i]
        key_noise = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
        x = sch.step(state, eps, i, x, noise=key_noise)
    # sigma_next=0 at the last step -> ancestral noise vanishes, x -> x0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_dpm_oracle_recovers_x0(rng):
    sch = DPMSolverMultistepScheduler(
        prediction_type="epsilon", rescale_betas_zero_snr=False
    )
    steps = 20
    state = sch.set_timesteps(steps)
    x0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    x = sch.add_noise(state, x0, noise, state.timesteps[0])
    prev_x0 = None
    for i in range(steps):
        t = state.timesteps[i]
        a = state.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        x, cur_x0 = sch.step(state, eps, i, x, prev_x0=prev_x0, num_steps=steps)
        prev_x0 = cur_x0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2e-3)


def test_cog_dpm_two_sample_interface(rng):
    sch = CogVideoXDPMScheduler()
    state = sch.set_timesteps(8)
    x = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    out0, x0_a = sch.step(state, m, 0, x, prev_x0=None, num_steps=8)
    out1, x0_b = sch.step(state, m, 1, out0, prev_x0=x0_a, num_steps=8)
    assert out1.shape == x.shape and np.all(np.isfinite(np.asarray(out1)))


def test_pndm_oracle_recovers_x0(rng):
    # set_alpha_to_one so the final step integrates fully to alpha=1
    # (the PNDM default keeps sqrt(1-abar_0)~0.03 residual noise by design)
    sch = PNDMScheduler(prediction_type="epsilon", set_alpha_to_one=True)
    steps = 25
    state = sch.set_timesteps(steps)
    x0 = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
    x = sch.add_noise(state, x0, noise, state.timesteps[0])
    loop = sch.init_loop_state(x0.shape)
    for i in range(sch.num_loop_steps(steps)):
        t = state.timesteps[i]
        a = state.alphas_cumprod[t]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        x, loop = sch.step(state, eps, i, x, loop)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=2e-3)
