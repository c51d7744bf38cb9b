"""LoRA fine-tuning entry point.

Replaces the reference training stack (notebooks/05_11_25_training/
lora_utils_ours/main.py + accelerate/DeepSpeed/NCCL, slurm_train_lora.sh)
with one pjit program over a {dp x tp} mesh: data-parallel batches,
tensor-parallel base params, replicated LoRA adapters, orbax checkpoints
with latest-resume.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def get_parser():
    p = argparse.ArgumentParser(description="TrajectoryCrafter-TPU LoRA training")
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory of pre-encoded .npz latent samples")
    p.add_argument("--output_dir", type=str, default="./lora_out")
    p.add_argument("--transformer_path", type=str, default=None,
                   help="base DiT checkpoint; dev-scale random model if unset")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--train_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=8.0)
    p.add_argument("--cfg_dropout", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="average gradients over N micro-batches per update")
    p.add_argument("--motion_sub_loss", action="store_true")
    p.add_argument("--checkpointing_steps", type=int, default=200)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="'latest' or a checkpoint path")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh_dp", type=int, default=1)
    p.add_argument("--mesh_tp", type=int, default=1)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--validate_every", type=int, default=0,
                   help="run held-out validation every N steps (0 = off)")
    p.add_argument("--val_fraction", type=float, default=0.1,
                   help="fraction of samples held out for validation")
    return p


def build_base_model(args, sample):
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel

    if args.transformer_path and os.path.isdir(args.transformer_path):
        from trajectorycrafter_tpu.utils.checkpoints import load_dit

        return load_dit(args.transformer_path, dtype=jnp.bfloat16)
    # dev-scale model matching the dataset's latent shapes
    f, h, w, c = sample["gt_latents"].shape
    text_dim = sample["prompt_embeds"].shape[-1]
    model = CrossTransformer3DModel(
        num_attention_heads=4, attention_head_dim=16, in_channels=2 * c + 1,
        out_channels=c, time_embed_dim=32, text_embed_dim=text_dim,
        num_layers=4, max_text_seq_length=sample["prompt_embeds"].shape[0],
        cross_attn_dim_head=16, cross_attn_num_heads=4,
        use_rotary_positional_embeddings=True, dtype=jnp.float32,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, h, w, c)), jnp.zeros((1,) + sample["prompt_embeds"].shape),
        jnp.zeros((1,)), jnp.zeros((1, f, h, w, c + 1)),
        jnp.zeros((1,) + sample["ref_latents"].shape),
    )["params"]
    return model, params


def main(argv=None):
    from trajectorycrafter_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from trajectorycrafter_tpu.parallel import (
        dit_param_sharding, make_mesh, shard_batch)
    from trajectorycrafter_tpu.schedulers import CogVideoXDDIMScheduler
    from trajectorycrafter_tpu.training import (
        TrainState, init_lora_params, make_train_step,
    )
    from trajectorycrafter_tpu.training.data import LatentsDataset
    from trajectorycrafter_tpu.training.step import make_optimizer
    from trajectorycrafter_tpu.utils.checkpoints import restore_params, save_params

    from trajectorycrafter_tpu.training.validation import (
        MetricsLogger,
        make_eval_loss,
        run_validation,
        sanity_check_batch,
    )

    data = LatentsDataset(args.data_dir)
    val_data = None
    if args.validate_every > 0:
        data, val_data = data.split(args.val_fraction, seed=args.seed)
        print(f"dataset split: {len(data)} train / {len(val_data)} val")
    sample = data[0]
    model, params = build_base_model(args, sample)
    logger = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))

    mesh = make_mesh(dp=args.mesh_dp, sp=1, tp=args.mesh_tp)
    params = jax.device_put(params, dit_param_sharding(params, mesh))

    scheduler = CogVideoXDDIMScheduler()
    sch_state = scheduler.set_timesteps(50)
    lora = init_lora_params(jax.random.PRNGKey(args.seed), params,
                            rank=args.lora_rank)
    optimizer = make_optimizer(lr=args.learning_rate,
                               grad_accum_steps=args.gradient_accumulation_steps)
    opt_state = optimizer.init(lora)
    state = TrainState(lora=lora, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, jax.tree.map(lambda _: repl, state))

    start_step = 0
    if args.resume_from_checkpoint:
        path = args.resume_from_checkpoint
        if path == "latest":
            ckpts = sorted(
                d for d in os.listdir(args.output_dir) if d.startswith("ckpt_")
            )
            path = os.path.join(args.output_dir, ckpts[-1]) if ckpts else None
        if path and os.path.isdir(path):
            restored = restore_params(path)
            state = state._replace(lora=restored["lora"])
            start_step = int(restored.get("step", 0))
            print(f"resumed from {path} at step {start_step}")

    step_fn = make_train_step(
        model, params, scheduler, sch_state, optimizer,
        cfg_dropout_prob=args.cfg_dropout, motion_sub_loss=args.motion_sub_loss,
        lora_alpha=args.lora_alpha, lora_rank=args.lora_rank,
    )
    with jax.set_mesh(mesh):
        jstep = jax.jit(step_fn)
        eval_jit = None
        if val_data is not None:
            eval_jit = jax.jit(make_eval_loss(
                model, params, scheduler, sch_state,
                lora_alpha=args.lora_alpha, lora_rank=args.lora_rank,
            ))

        batches = data.iter_batches(args.batch_size, seed=args.seed)
        key = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        for step in range(start_step, args.train_steps):
            batch_np = next(batches)
            if step == start_step:
                # first-batch sanity dump (reference training_loop.py:312-321)
                print(sanity_check_batch(batch_np, step))
            batch = jax.device_put(
                {k: jnp.asarray(v) for k, v in batch_np.items()},
                shard_batch(batch_np, mesh))
            key, sub = jax.random.split(key)
            state, metrics = jstep(state, batch, sub)
            if (step + 1) % args.log_every == 0:
                loss = float(metrics["loss"])
                gn = float(metrics["grad_norm"])
                dt = (time.time() - t0) / args.log_every
                print(f"step {step+1}: loss {loss:.4f} grad_norm {gn:.3f} "
                      f"{dt*1000:.0f} ms/step")
                logger.log(step + 1, loss=loss, grad_norm=gn,
                           ms_per_step=dt * 1000.0, lr=args.learning_rate)
                t0 = time.time()
            if eval_jit is not None and (step + 1) % args.validate_every == 0:
                val = run_validation(
                    eval_jit, state.lora,
                    ({k: v[None] for k, v in val_data[i].items()}
                     for i in range(len(val_data))),
                    seed=args.seed,
                )
                print(f"step {step+1}: val_loss {val['val_loss']:.4f} "
                      f"({val['val_samples']} samples)")
                logger.log(step + 1, **val)
                t0 = time.time()
            if (step + 1) % args.checkpointing_steps == 0:
                path = os.path.join(args.output_dir, f"ckpt_{step+1:07d}")
                save_params({"lora": jax.device_get(state.lora),
                             "step": step + 1}, path)
                print(f"saved {path}")

    final = os.path.join(args.output_dir, "lora_final")
    save_params({"lora": jax.device_get(state.lora),
                 "step": args.train_steps}, final)
    print(f"training done; adapters at {final}")


if __name__ == "__main__":
    main()
