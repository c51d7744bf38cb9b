"""Consistent-depth autoregressive entry (alignment-driven point-cloud loop)
(reference notebooks/12_11_25_consistent_depth/autoregressive_alignment/
main_alignment.py).

The VDA estimator is optional: pass ``--vda_ckpt`` (an orbax checkpoint
produced by ``python -m trajectorycrafter_tpu.utils.convert --component vda``)
to enable the visual-prompt test-time alignment; without it the lightweight
per-frame scale/shift alignment runs against the rendered sparse depth.
"""

from __future__ import annotations

import os

from trajectorycrafter_tpu.cli import config_from_args, get_parser
from trajectorycrafter_tpu.consistent_autoregressive import (
    TrajCrafterConsistentDepth,
)
from trajectorycrafter_tpu.utils.video import save_video


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--n_splits", type=int, default=4)
    parser.add_argument("--total_theta", type=float, default=90.0)
    parser.add_argument("--total_phi", type=float, default=0.0)
    parser.add_argument("--total_dr", type=float, default=0.0)
    parser.add_argument("--align_epochs", type=int, default=50)
    parser.add_argument("--resize_factor", type=int, default=2,
                        help="alignment optimisation runs at 1/N resolution "
                             "(main_alignment glue :245)")
    parser.add_argument("--vda_ckpt", type=str, default=None,
                        help="orbax VDA checkpoint dir (enables the "
                             "visual-prompt trainer)")
    parser.add_argument("--vda_encoder", choices=("vits", "vitb", "vitl"),
                        default="vitl")
    parser.add_argument("--tae_weight", type=float, default=0.0,
                        help="weight of the geometric reprojection TAE term "
                             "in the alignment loss (reference ships 0.0)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    os.makedirs(cfg.save_dir, exist_ok=True)

    vda = None
    if args.vda_ckpt:
        from trajectorycrafter_tpu.models import vda as vda_mod
        from trajectorycrafter_tpu.utils.checkpoints import restore_params

        vcfg = getattr(vda_mod, f"vda_{args.vda_encoder}_config")()
        model = vda_mod.VideoDepthAnything(vcfg)
        vda = (model, restore_params(args.vda_ckpt))

    tc = TrajCrafterConsistentDepth(cfg, vda=vda,
                                    align_epochs=args.align_epochs,
                                    resize_factor=args.resize_factor,
                                    tae_weight=args.tae_weight)
    video = tc.infer_autoregressive(
        n_splits=args.n_splits,
        theta=args.total_theta,
        phi=args.total_phi,
        d_r=args.total_dr,
    )
    save_video(video, os.path.join(cfg.save_dir, "autoregressive_aligned.mp4"),
               fps=cfg.fps)
    print(f"wrote {video.shape[0]} frames to {cfg.save_dir}")


if __name__ == "__main__":
    main()
