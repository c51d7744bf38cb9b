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


# ----------------------------------------------------------------------------
# Dataset-collection harness (reference collect_dataset.py)
# ----------------------------------------------------------------------------


class CameraMotionFilter:
    """Gate samples by cumulative camera motion (reference
    collect_dataset.py:80-157 ``CameraMotionFilter``): keep clips whose total
    translation/rotation stays under the maxima but is not degenerate-static.
    Pure numpy -- runs host-side during dataset collection."""

    def __init__(self, min_total_translation: float = 10.0,
                 max_total_translation: float = 100.0,
                 min_total_rotation: float = 0.1,
                 max_total_rotation: float = 0.55):
        self.min_total_translation = min_total_translation
        self.max_total_translation = max_total_translation
        self.min_total_rotation = min_total_rotation
        self.max_total_rotation = max_total_rotation

    def compute_motion_metrics(self, poses: np.ndarray) -> Dict[str, float]:
        poses = np.asarray(poses, np.float32)
        if poses.shape[1:] != (4, 4):
            raise ValueError("Expected poses shape: (n_frames, 4, 4)")
        translations = poses[:, :3, 3]
        rotations = poses[:, :3, :3]

        trans_distances = np.linalg.norm(np.diff(translations, axis=0), axis=1)

        # relative rotation angle from the trace of R_curr @ R_prev^T
        r_rel = rotations[1:] @ np.swapaxes(rotations[:-1], -1, -2)
        traces = np.trace(r_rel, axis1=-2, axis2=-1)
        rotation_angles = np.arccos(np.clip((traces - 1) / 2, -1.0, 1.0))

        return {
            "max_frame_translation": float(trans_distances.max()),
            "mean_frame_translation": float(trans_distances.mean()),
            "total_translation": float(trans_distances.sum()),
            "max_frame_rotation": float(rotation_angles.max()),
            "mean_frame_rotation": float(rotation_angles.mean()),
            "total_rotation": float(rotation_angles.sum()),
        }

    def is_low_motion(self, poses: np.ndarray):
        m = self.compute_motion_metrics(poses)
        translation_ok = m["total_translation"] <= self.max_total_translation
        rotation_ok = m["total_rotation"] <= self.max_total_rotation
        non_zero = (m["total_translation"] >= self.min_total_translation
                    or m["total_rotation"] >= self.min_total_rotation)
        return translation_ok and rotation_ok and non_zero, m


def collect_activation_dataset(
    model,
    params,
    scheduler,
    sch_state,
    samples,
    timesteps: Sequence[int],
    block_indices: Sequence[int],
    out_dir: str,
    motion_filter: CameraMotionFilter | None = None,
    seed: int = 0,
) -> Dict[str, Any]:
    """Write the per-timestep x per-block activation dataset the probing
    experiments train on (reference collect_dataset.py:292-344 saves
    ``features/<timestep>/<key>.pt`` plus depths/poses per sample; the slurm
    array sweeps timesteps x features, slurm_mlp_probing.sh:18-37).

    ``samples``: iterable of dicts with gt_latents (F,h,w,C), prompt_embeds,
    ref_latents, inpaint_latents, and optionally poses (N,4,4) and
    depth (F,h,w).  For each requested diffusion timestep the GT latents are
    noised with q(x_t|x_0) (the state the denoiser actually sees at that step)
    and the chosen transformer blocks' video-token outputs are captured.

    Returns a manifest {kept: [...], skipped: [...], files: int}.
    """
    import os

    rng = jax.random.PRNGKey(seed)
    manifest = {"kept": [], "skipped": [], "files": 0}
    for idx, s in enumerate(samples):
        name = s.get("name", f"sample_{idx:04d}")
        if motion_filter is not None and "poses" in s:
            ok, metrics = motion_filter.is_low_motion(s["poses"])
            if not ok:
                manifest["skipped"].append({"name": name, "metrics": metrics})
                continue
        sample_dir = os.path.join(out_dir, name)
        os.makedirs(sample_dir, exist_ok=True)

        x0 = jnp.asarray(s["gt_latents"])[None].astype(jnp.float32)
        rng, k_n = jax.random.split(rng)
        noise = jax.random.normal(k_n, x0.shape, jnp.float32)
        for t in timesteps:
            t_arr = jnp.full((1,), t, jnp.int32)
            noisy = scheduler.add_noise(sch_state, x0, noise, t_arr)
            feats = collect_features(
                model, params, block_indices,
                noisy.astype(model.dtype),
                jnp.asarray(s["prompt_embeds"])[None].astype(model.dtype),
                t_arr.astype(jnp.float32),
                jnp.asarray(s["inpaint_latents"])[None].astype(model.dtype),
                jnp.asarray(s["ref_latents"])[None].astype(model.dtype),
            )
            t_dir = os.path.join(sample_dir, "features", f"timestep_{t}")
            os.makedirs(t_dir, exist_ok=True)
            for key, value in feats.items():
                np.save(os.path.join(t_dir, f"{key}.npy"),
                        np.asarray(value[0], np.float32))
                manifest["files"] += 1
        aux_dir = os.path.join(sample_dir, "depths")
        os.makedirs(aux_dir, exist_ok=True)
        if "depth" in s:
            np.save(os.path.join(aux_dir, "depths.npy"),
                    np.asarray(s["depth"], np.float32))
        if "poses" in s:
            np.save(os.path.join(aux_dir, "poses.npy"),
                    np.asarray(s["poses"], np.float32))
        manifest["kept"].append(name)
    # persist the run's sample list: ActivationDataset trains on exactly
    # these samples, so leftovers from a previous collection into the same
    # root can never misalign (token, depth) pairs
    import json

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ActivationDataset:
    """Loads one (timestep, block) slice of a collected activation dataset
    for probe training (reference mlp_probing.py DepthProbingDataset)."""

    def __init__(self, root: str, timestep: int, block: int):
        import glob
        import json
        import os

        self.items = []
        man_path = os.path.join(root, "manifest.json")
        if os.path.isfile(man_path):
            # restrict to the last collection run's kept samples (stale
            # sample_* dirs from earlier runs may survive in the same root)
            with open(man_path) as f:
                kept = json.load(f)["kept"]
            paths = [os.path.join(root, n, "features", f"timestep_{timestep}",
                                  f"transformer_block_{block}.npy")
                     for n in sorted(kept)]
            missing = [p for p in paths if not os.path.isfile(p)]
            if missing:
                raise FileNotFoundError(
                    f"manifest lists samples without activations for "
                    f"timestep={timestep} block={block}: {missing[:3]}")
        else:
            paths = sorted(glob.glob(os.path.join(
                root, "*", "features", f"timestep_{timestep}",
                f"transformer_block_{block}.npy")))
        for feat_path in paths:
            sample_dir = os.path.dirname(os.path.dirname(os.path.dirname(feat_path)))
            depth_path = os.path.join(sample_dir, "depths", "depths.npy")
            self.items.append(
                (feat_path, depth_path if os.path.isfile(depth_path) else None))
        if not self.items:
            raise FileNotFoundError(
                f"no activations for timestep={timestep} block={block} under {root}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        feat_path, depth_path = self.items[i]
        tokens = np.load(feat_path)
        depth = np.load(depth_path) if depth_path else None
        return tokens, depth

    def stacked(self):
        """-> (tokens (N,S,D), depths (N,...) or None) for full-batch probes."""
        tokens = np.stack([np.load(f) for f, _ in self.items])
        if any(d is None for _, d in self.items):
            return tokens, None
        return tokens, np.stack([np.load(d) for _, d in self.items])
