"""Gradient accumulation (training/step.make_optimizer grad_accum_steps).

The reference exposes ``gradient_accumulation_steps`` through accelerate
(lora_utils_ours/config.py; applied around training_loop.py:261-271); ours is
optax.MultiSteps.  The contract test: N accumulated micro-steps produce the
same adapter update as one N-sized batch step, given identical per-sample
noise/timesteps (supplied through the batch to bypass rng sampling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.schedulers import CogVideoXDDIMScheduler
    from trajectorycrafter_tpu.training import init_lora_params

    f, h, w, c = 2, 4, 4, 4
    model = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=2 * c + 1,
        out_channels=c, time_embed_dim=16, text_embed_dim=8, num_layers=2,
        max_text_seq_length=3, cross_attn_dim_head=8, cross_attn_num_heads=2,
        use_rotary_positional_embeddings=True, attention_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, h, w, c)), jnp.zeros((1, 3, 8)), jnp.zeros((1,)),
        jnp.zeros((1, f, h, w, c + 1)), jnp.zeros((1, 1, h, w, c)),
    )["params"]
    scheduler = CogVideoXDDIMScheduler()
    sch_state = scheduler.set_timesteps(50)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=2)
    return model, params, scheduler, sch_state, lora, (f, h, w, c)


def _batch(rng, n, shapes):
    f, h, w, c = shapes
    return {
        "gt_latents": rng.standard_normal((n, f, h, w, c)).astype(np.float32),
        "prompt_embeds": rng.standard_normal((n, 3, 8)).astype(np.float32),
        "ref_latents": rng.standard_normal((n, 1, h, w, c)).astype(np.float32),
        "inpaint_latents": rng.standard_normal((n, f, h, w, c + 1)).astype(np.float32),
        "timesteps": rng.integers(0, 1000, (n,)).astype(np.int32),
        "noise": rng.standard_normal((n, f, h, w, c)).astype(np.float32),
    }


@pytest.mark.slow
def test_accumulated_micro_steps_match_big_batch(setup, rng):
    from trajectorycrafter_tpu.training import TrainState, make_train_step
    from trajectorycrafter_tpu.training.step import make_optimizer

    model, params, scheduler, sch_state, lora, shapes = setup
    n_accum = 4
    batch = _batch(rng, n_accum, shapes)
    kwargs = dict(cfg_dropout_prob=0.0, lora_alpha=4.0, lora_rank=2)

    # one big-batch step
    opt_big = make_optimizer(lr=1e-2)
    step_big = jax.jit(make_train_step(
        model, params, scheduler, sch_state, opt_big, **kwargs))
    state_big = TrainState(lora=lora, opt_state=opt_big.init(lora),
                           step=jnp.zeros((), jnp.int32))
    state_big, m_big = step_big(
        state_big, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(9))

    # n_accum micro-steps of batch 1 through MultiSteps
    opt_acc = make_optimizer(lr=1e-2, grad_accum_steps=n_accum)
    step_acc = jax.jit(make_train_step(
        model, params, scheduler, sch_state, opt_acc, **kwargs))
    state_acc = TrainState(lora=lora, opt_state=opt_acc.init(lora),
                           step=jnp.zeros((), jnp.int32))
    for i in range(n_accum):
        micro = {k: jnp.asarray(v[i : i + 1]) for k, v in batch.items()}
        prev = state_acc
        state_acc, _ = step_acc(state_acc, micro, jax.random.PRNGKey(9))
        if i < n_accum - 1:
            # adapters must be untouched until the final micro-step
            same = jax.tree.map(
                lambda a, b: bool(jnp.all(a == b)), prev.lora, state_acc.lora)
            assert all(jax.tree.leaves(same))

    for a, b in zip(jax.tree.leaves(state_big.lora),
                    jax.tree.leaves(state_acc.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_supplied_timesteps_and_noise_are_honored(setup, rng):
    """batch-supplied timesteps/noise make the loss rng-independent."""
    from trajectorycrafter_tpu.training import TrainState, make_train_step
    from trajectorycrafter_tpu.training.step import make_optimizer

    model, params, scheduler, sch_state, lora, shapes = setup
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, 2, shapes).items()}
    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_train_step(
        model, params, scheduler, sch_state, opt,
        cfg_dropout_prob=0.0, lora_alpha=4.0, lora_rank=2))
    state = TrainState(lora=lora, opt_state=opt.init(lora),
                       step=jnp.zeros((), jnp.int32))
    _, m1 = step(state, batch, jax.random.PRNGKey(0))
    _, m2 = step(state, batch, jax.random.PRNGKey(123))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
