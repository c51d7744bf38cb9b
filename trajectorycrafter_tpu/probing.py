"""DiT feature probing (SURVEY 2.18).

Rebuild of notebooks/15_10_25_depth/ (mlp_probing.py, collect_dataset.py):
collect intermediate CrossTransformer3D activations at chosen blocks /
timesteps (the reference instruments the transformer with commented hooks,
crosstransformer3d.py:739-741,826-841) and train small conv/MLP probes to
predict depth from them.

Instead of mutating the model with hooks, activations are captured through
flax's ``capture_intermediates`` -- the forward stays a pure jit program.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


def collect_features(
    model,
    params,
    block_indices: Sequence[int],
    *model_args,
    **model_kwargs,
) -> Dict[str, jnp.ndarray]:
    """Run the DiT capturing each requested block's video-token output."""
    filt = lambda mdl, method: any(
        mdl.name == f"blocks_{i}" for i in block_indices
    )
    out, state = model.apply(
        {"params": params}, *model_args, **model_kwargs,
        capture_intermediates=filt, mutable=["intermediates"],
    )
    feats = {}
    inter = state["intermediates"]
    for i in block_indices:
        node = inter[f"blocks_{i}"]["__call__"][0]
        feats[f"transformer_block_{i}"] = node[0]  # video-token stream
    return feats


class ConvProbe(nn.Module):
    """Tokens (B, S_video, D) -> depth map (B, F, H, W) via 1x1 convs
    (reference mlp_probing.py:87)."""

    frames: int
    height: int  # latent-grid height (post patch)
    width: int
    hidden: int = 128

    @nn.compact
    def __call__(self, tokens):
        b = tokens.shape[0]
        x = tokens.reshape(b, self.frames, self.height, self.width, tokens.shape[-1])
        x = nn.Conv(self.hidden, (1, 1), name="conv1")(
            x.reshape(b * self.frames, self.height, self.width, -1))
        x = nn.relu(x)
        x = nn.Conv(self.hidden, (3, 3), padding="SAME", name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="conv_out")(x)
        return x.reshape(b, self.frames, self.height, self.width)


class MLPProbe(nn.Module):
    """Per-token depth regression (reference mlp_probing.py:148)."""

    frames: int
    height: int
    width: int
    hidden: int = 256

    @nn.compact
    def __call__(self, tokens):
        b = tokens.shape[0]
        x = nn.Dense(self.hidden, name="fc1")(tokens)
        x = nn.relu(x)
        x = nn.Dense(1, name="fc2")(x)
        return x.reshape(b, self.frames, self.height, self.width)


class ProbeTrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_probe_trainer(probe, lr: float = 1e-3):
    """-> (init_fn(key, example_tokens), step_fn(state, tokens, depth))."""
    opt = optax.adam(lr)

    def init_fn(key, tokens):
        params = probe.init(key, tokens)["params"]
        return ProbeTrainState(params, opt.init(params))

    @jax.jit
    def step_fn(state: ProbeTrainState, tokens, target_depth):
        def loss_fn(p):
            pred = probe.apply({"params": p}, tokens)
            return jnp.mean((pred - target_depth) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return ProbeTrainState(params, opt_state), loss

    return init_fn, step_fn


def relative_depth_error(pred: np.ndarray, target: np.ndarray) -> float:
    """Validation metric (reference lora_utils_ours/validation.py:38)."""
    eps = 1e-6
    return float(np.mean(np.abs(pred - target) / np.maximum(np.abs(target), eps)))
