"""Autoregressive long-trajectory entry (v2, global point cloud)
(reference /root/reference/autoregressive_global.py)."""

from __future__ import annotations

import os

from trajectorycrafter_tpu.autoregressive import TrajCrafterGlobalPointCloud
from trajectorycrafter_tpu.cli import config_from_args, get_parser
from trajectorycrafter_tpu.utils.video import save_video


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--n_splits", type=int, default=4)
    parser.add_argument("--overlap_frames", type=int, default=8)
    parser.add_argument("--total_theta", type=float, default=180.0)
    parser.add_argument("--total_phi", type=float, default=0.0)
    parser.add_argument("--total_dr", type=float, default=0.0)
    parser.add_argument("--max_points", type=int, default=4_000_000)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    os.makedirs(cfg.save_dir, exist_ok=True)

    tc = TrajCrafterGlobalPointCloud(cfg)
    video = tc.infer_autoregressive(
        n_splits=args.n_splits,
        overlap_frames=args.overlap_frames,
        theta=args.total_theta,
        phi=args.total_phi,
        d_r=args.total_dr,
        max_points=args.max_points,
    )
    save_video(video, os.path.join(cfg.save_dir, "autoregressive_global.mp4"),
               fps=cfg.fps)
    print(f"wrote {video.shape[0]} frames to {cfg.save_dir}")


if __name__ == "__main__":
    main()
