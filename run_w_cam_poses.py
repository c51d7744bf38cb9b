"""Known-camera-pose entry (reference /root/reference/run_w_cam_poses.py).

Re-renders a source camera's video from a target camera using dataset
calibration (Panoptic Studio json layout by default).

``--smooth`` switches to the SLERP camera-fly variant (reference
run_w_cam_poses_mvtracker_smooth.py): the per-frame target camera
interpolates from the source to the target camera over the clip, and with
``--target_video`` the last generated frame is scored against the held-out
target view (PSNR/SSIM/MS-SSIM -> metrics.json).
"""

from __future__ import annotations

import json
import os

import numpy as np

from trajectorycrafter_tpu.cli import config_from_args, get_parser
from trajectorycrafter_tpu.known_poses import (
    CalibratedCamera,
    CameraPoseTrajCrafter,
    panoptic_to_camera,
    undistort_and_resize,
)
from trajectorycrafter_tpu.utils.video import pad_to_length, read_video_frames


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--calib_json", type=str, required=True,
                        help="Panoptic-style calibration json with a "
                             "'cameras' list of {name, K, R, t, distCoef}")
    parser.add_argument("--source_cam", type=str, required=True)
    parser.add_argument("--target_cam", type=str, required=True)
    parser.add_argument("--depth_npy", type=str, default=None,
                        help="optional (F, H, W) metric depth .npy; "
                             "estimated otherwise")
    parser.add_argument("--smooth", action="store_true",
                        help="SLERP-interpolate the target camera from "
                             "source to target over the clip")
    parser.add_argument("--target_video", type=str, default=None,
                        help="held-out target-view video for the smooth "
                             "variant's PSNR/SSIM/MS-SSIM eval")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    os.makedirs(cfg.save_dir, exist_ok=True)

    with open(args.calib_json) as f:
        calib = json.load(f)
    cams = {c.get("name", str(i)): panoptic_to_camera(c)
            for i, c in enumerate(calib["cameras"])}
    src, tgt = cams[args.source_cam], cams[args.target_cam]

    # read at NATIVE resolution: undistortion must run with the calibrated
    # K/distCoef before any resize (reference run_w_cam_poses.py:71-149)
    frames = read_video_frames(cfg.video_path, cfg.video_length, cfg.stride,
                               cfg.depth.max_res, width=None, height=None)
    frames = pad_to_length(frames, cfg.video_length)
    native_hw = frames.shape[1:3]
    frames, k_scaled = undistort_and_resize(frames, src, cfg.warp_size)
    src = CalibratedCamera(K=k_scaled, R=src.R, t=src.t)
    # rescale the target camera's intrinsics by the same factors
    tgt_k = tgt.K.copy()
    tgt_k[0] *= cfg.warp_size[1] / native_hw[1]
    tgt_k[1] *= cfg.warp_size[0] / native_hw[0]
    tgt = CalibratedCamera(K=tgt_k, R=tgt.R, t=tgt.t)
    depths = np.load(args.depth_npy) if args.depth_npy else None

    tc = CameraPoseTrajCrafter(cfg)
    if args.smooth:
        target_frames = None
        if args.target_video:
            target_frames = read_video_frames(
                args.target_video, cfg.video_length, cfg.stride,
                cfg.depth.max_res, width=None, height=None)
            target_frames = pad_to_length(target_frames, cfg.video_length)
        _, metrics = tc.infer_camera_poses_smooth(
            frames, depths, src, tgt, target_frames=target_frames)
        if metrics is not None:
            print(json.dumps(metrics["metrics"]))
    else:
        tc.infer_camera_poses(frames, depths, src, tgt)
    print(f"outputs written to {cfg.save_dir}")


if __name__ == "__main__":
    main()
