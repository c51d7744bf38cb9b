"""Feature-probing entry (SURVEY 2.18; reference slurm_mlp_probing.sh +
notebooks/15_10_25_depth/mlp_probing.py).

Collects CrossTransformer3D activations at chosen blocks over latent samples
and trains a Conv probe to regress depth from them.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description="DiT depth probing")
    p.add_argument("--data_dir", type=str, required=True,
                   help=".npz latent samples (training/data.py layout) with "
                        "an optional 'depth' key per sample")
    p.add_argument("--transformer_path", type=str, default=None)
    p.add_argument("--blocks", type=int, nargs="+", default=[1, 3])
    p.add_argument("--timestep", type=float, default=311.0)
    p.add_argument("--collect_dir", type=str, default=None,
                   help="collect a features/<timestep>/<block> activation "
                        "dataset here first (reference collect_dataset.py), "
                        "then train probes from it; --timesteps selects the "
                        "sweep")
    p.add_argument("--timesteps", type=int, nargs="+", default=None,
                   help="timesteps for --collect_dir (default: [--timestep])")
    p.add_argument("--motion_filter", action="store_true",
                   help="apply the CameraMotionFilter to samples with poses")
    p.add_argument("--probe", choices=["conv", "mlp"], default="conv")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--output_dir", type=str, default="./probe_out")
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from train_lora import build_base_model

    from trajectorycrafter_tpu.probing import (
        ConvProbe,
        MLPProbe,
        collect_features,
        make_probe_trainer,
        relative_depth_error,
    )
    from trajectorycrafter_tpu.training.data import LatentsDataset
    from trajectorycrafter_tpu.utils.checkpoints import save_params

    data = LatentsDataset(args.data_dir)
    sample = data[0]
    model, params = build_base_model(args, sample)
    f, h, w, c = sample["gt_latents"].shape
    hp, wp = h // model.patch_size, w // model.patch_size

    def train_probe(block, tokens, target, tag):
        cls = ConvProbe if args.probe == "conv" else MLPProbe
        probe = cls(frames=f, height=hp, width=wp)
        init_fn, step_fn = make_probe_trainer(probe, lr=args.lr)
        state = init_fn(jax.random.PRNGKey(0), tokens)
        for step in range(args.steps):
            state, loss = step_fn(state, tokens, target)
            if (step + 1) % 50 == 0:
                print(f"{tag} step {step+1}: loss {float(loss):.5f}")
        pred = probe.apply({"params": state.params}, tokens)
        err = relative_depth_error(np.asarray(pred), np.asarray(target))
        print(f"{tag}: relative depth error {err:.4f}")
        save_params({"probe": jax.device_get(state.params)},
                    os.path.join(args.output_dir, f"probe_{tag}"))

    def depth_target(s):
        depth = s.get("depth")
        if depth is None:  # latent-magnitude proxy when no GT depth stored
            depth = np.abs(s["gt_latents"]).mean(-1)
        return np.asarray(jax.image.resize(jnp.asarray(depth), (f, hp, wp),
                                           "linear"))

    if args.collect_dir:
        # collect once (timesteps x blocks), then train per slice -- the
        # reference's two-stage collect_dataset.py -> mlp_probing.py flow
        from trajectorycrafter_tpu.probing import (
            ActivationDataset,
            CameraMotionFilter,
            collect_activation_dataset,
        )
        from trajectorycrafter_tpu.schedulers import CogVideoXDDIMScheduler

        scheduler = CogVideoXDDIMScheduler()
        sch_state = scheduler.set_timesteps(50)
        timesteps = args.timesteps or [int(args.timestep)]
        samples = []
        for i in range(len(data)):
            s = dict(data[i])
            s["name"] = f"sample_{i:04d}"
            samples.append(s)
        manifest = collect_activation_dataset(
            model, params, scheduler, sch_state, samples, timesteps,
            args.blocks, args.collect_dir,
            motion_filter=CameraMotionFilter() if args.motion_filter else None,
        )
        print(f"collected {manifest['files']} feature files; "
              f"kept {len(manifest['kept'])}, skipped {len(manifest['skipped'])}")
        if not manifest["kept"]:
            print("no samples passed the camera-motion filter; nothing to "
                  "train (adjust CameraMotionFilter thresholds or drop "
                  "--motion_filter)")
            return
        kept = set(manifest["kept"])
        targets = jnp.asarray(np.stack(
            [depth_target(s) for s in samples if s["name"] in kept]))
        for t in timesteps:
            for block in args.blocks:
                ds = ActivationDataset(args.collect_dir, t, block)
                tokens, _ = ds.stacked()
                train_probe(block, jnp.asarray(tokens), targets,
                            f"t{t}_block{block}")
        return

    for block in args.blocks:
        feats_all, targets = [], []
        for i in range(len(data)):
            s = data[i]
            feats = collect_features(
                model, params, [block],
                jnp.asarray(s["gt_latents"])[None],
                jnp.asarray(s["prompt_embeds"])[None],
                jnp.asarray([args.timestep]),
                jnp.asarray(s["inpaint_latents"])[None],
                jnp.asarray(s["ref_latents"])[None],
            )
            feats_all.append(np.asarray(feats[f"transformer_block_{block}"][0]))
            targets.append(depth_target(s))
        tokens = jnp.asarray(np.stack(feats_all))
        target = jnp.asarray(np.stack(targets))
        train_probe(block, tokens, target, f"block{block}")


if __name__ == "__main__":
    main()
