#!/bin/sh
# Example invocations for each camera mode (reference run.sh).
# Uncomment one block; all four modes share the same flag surface
# (trajectorycrafter_tpu/cli.py).

# gradual mode
python inference.py \
    --video_path './test/videos/synth.mp4' \
    --stride 2 \
    --out_dir experiments \
    --radius_scale 1 \
    --camera 'target' \
    --mode 'gradual' \
    --mask \
    --target_pose 0 -30 0.3 0 0 \
    --traj_txt 'test/trajs/loop2.txt'

# # direct mode (freeze-then-follow, cut=20)
# python inference.py ... --mode 'direct'

# # bullet time (last frame frozen, camera orbits)
# python inference.py ... --mode 'bullet'

# # dolly-zoom (per-frame focal ramp)
# python inference.py ... --mode 'zoom' --target_pose 0 0 0.5 0 0

# long trajectories:
# python inference_autoregressive.py --video_path v.mp4 --n_splits 4
# python autoregressive_global.py --video_path v.mp4 --n_splits 4
# python inference_alignment.py --video_path v.mp4 --n_splits 4

# orbit preset sweep (use --test_run for a single variant):
# python inference_orbits.py --video_path v.mp4

# multi-chip: add --mesh_dp/--mesh_sp/--mesh_tp (device count must equal
# dp*sp*tp), e.g. on a v5e-8: --mesh_sp 4 --mesh_tp 2
