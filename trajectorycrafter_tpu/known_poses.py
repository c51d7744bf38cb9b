"""Known-camera-pose dataset pipelines (SURVEY 2.15).

Replaces the reference's run_w_cam_poses*.py family: instead of synthesising
a spherical trajectory, calibrated dataset cameras (K, R, t, optional
distortion) drive the source->target warping -- Panoptic Studio
(run_w_cam_poses.py:13-27), DyCheck-iPhone (run_w_cam_poses_iphone.py:15) and
MVTracker/Kubric (run_w_cam_poses_mvtracker.py:12-15) conventions.

Camera conversion + undistortion run on host (cv2/numpy prologue); warping
and diffusion use the shared jit stack.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

import jax.numpy as jnp

from trajectorycrafter_tpu.ops.splat import forward_warp_batch
from trajectorycrafter_tpu.orchestrator import TrajCrafter


@dataclass
class CalibratedCamera:
    """One dataset camera: intrinsics + world-to-camera extrinsics."""

    K: np.ndarray  # (3, 3)
    R: np.ndarray  # (3, 3)
    t: np.ndarray  # (3,) or (3, 1)
    dist_coef: Optional[np.ndarray] = None  # cv2 distortion coefficients

    @property
    def w2c(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = self.R
        m[:3, 3] = np.asarray(self.t).reshape(3)
        return m

    @property
    def c2w(self) -> np.ndarray:
        return np.linalg.inv(self.w2c)


def panoptic_to_camera(calib: dict) -> CalibratedCamera:
    """Panoptic Studio json calibration entry -> CalibratedCamera
    (reference run_w_cam_poses.py:13-27; t is in cm -> metres)."""
    return CalibratedCamera(
        K=np.asarray(calib["K"], np.float64),
        R=np.asarray(calib["R"], np.float64),
        t=np.asarray(calib["t"], np.float64).reshape(3) / 100.0,
        dist_coef=np.asarray(calib.get("distCoef"), np.float64)
        if calib.get("distCoef") is not None else None,
    )


def undistort_and_resize(
    frames: np.ndarray,  # (F, H, W, 3) float [0, 1]
    cam: CalibratedCamera,
    out_size: Tuple[int, int],  # (height, width)
) -> Tuple[np.ndarray, np.ndarray]:
    """cv2 undistort then resize, rescaling the intrinsics accordingly
    (reference run_w_cam_poses.py:71-149)."""
    oh, ow = out_size
    h, w = frames.shape[1:3]
    K = cam.K.copy()
    out = []
    for f in frames:
        img = (f * 255.0).astype(np.uint8)
        if cam.dist_coef is not None:
            img = cv2.undistort(img, cam.K, cam.dist_coef)
        out.append(cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR))
    K[0] *= ow / w
    K[1] *= oh / h
    return np.stack(out).astype(np.float32) / 255.0, K


class CameraPoseTrajCrafter(TrajCrafter):
    """Source-view -> target-view re-rendering with calibrated cameras
    (reference CameraPoseTrajCrafter.infer_camera_poses, run_w_cam_poses.py:153)."""

    def infer_camera_poses(
        self,
        frames: np.ndarray,  # (F, H, W, 3) source-view frames in [0, 1]
        depths: Optional[np.ndarray],  # (F, H, W) metric depth or None
        source_cam: CalibratedCamera,
        target_cam: CalibratedCamera,
        prompt: Optional[str] = None,
    ) -> np.ndarray:
        cfg = self.cfg
        n = frames.shape[0]
        if depths is None:
            depths = self._estimate_depth(frames)[:, 0]
        prompt = (prompt or self.models.get_caption(frames[n // 2])) + \
            cfg.diffusion.refine_prompt

        # distinct K1 / K2 and dataset extrinsics (reference :214-227)
        t1 = jnp.tile(jnp.asarray(source_cam.w2c, jnp.float32)[None], (n, 1, 1))
        t2 = jnp.tile(jnp.asarray(target_cam.w2c, jnp.float32)[None], (n, 1, 1))
        k1 = jnp.tile(jnp.asarray(source_cam.K, jnp.float32)[None], (n, 1, 1))
        k2 = jnp.tile(jnp.asarray(target_cam.K, jnp.float32)[None], (n, 1, 1))
        warped, masks, _, _ = forward_warp_batch(
            jnp.asarray(frames * 2.0 - 1.0), jnp.asarray(depths),
            t1, t2, k1, k2, use_mask_clean=cfg.render.mask,
        )
        cond = (np.asarray(warped) + 1.0) / 2.0
        return self._diffuse_and_save(
            frames, cond, np.asarray(masks), prompt,
            ref_slice=slice(0, cfg.diffusion.ref_frames),
        )

    def infer_multiview(
        self,
        frames: np.ndarray,
        depths: Optional[np.ndarray],
        source_cam: CalibratedCamera,
        target_cams: Sequence[CalibratedCamera],
        prompt: Optional[str] = None,
    ) -> List[np.ndarray]:
        """Sweep several target cameras from one source view
        (iPhone/DyCheck multi-view variant, run_w_cam_poses_iphone.py:89)."""
        import os

        base = self.cfg.save_dir
        outs = []
        for i, cam in enumerate(target_cams):
            self.cfg.save_dir = os.path.join(base, f"view_{i:02d}")
            os.makedirs(self.cfg.save_dir, exist_ok=True)
            outs.append(self.infer_camera_poses(frames, depths, source_cam, cam, prompt))
        self.cfg.save_dir = base
        return outs
