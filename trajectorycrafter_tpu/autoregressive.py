"""Autoregressive long-trajectory generation (both reference variants).

v1 -- pose continuation (reference inference_autoregressive.py +
notebooks/28_08_25_trajectories/core_autoregressive.py): a large trajectory
(e.g. 180 degree orbit) is split into ``n_splits`` segments of
``video_length`` frames; each segment re-estimates depth on the previous
segment's generated video, continues the pose chain from the cumulative
anchor, warps and diffuses; segments are concatenated skipping the overlap.
Unlike the reference -- which round-trips each segment through gen.mp4 on
disk (core_autoregressive.py:95-102) -- frames stay in memory.

v2 -- global point cloud (reference autoregressive_global.py +
notebooks/06_10_25_vggt/utils_autoregressive.py): every frame is lifted once
into a world-space colored point cloud; each segment is rendered directly
from the cloud with the z-buffer renderer, diffused, re-lifted (with robust
median/IQR depth-scale alignment) and merged back.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.geometry.cameras import default_c2w, intrinsics_matrix
from trajectorycrafter_tpu.geometry.pointcloud import (
    lift_video_to_pointcloud,
    merge_pointclouds,
    render_zbuffer,
)
from trajectorycrafter_tpu.geometry.trajectory import generate_traj_specified
from trajectorycrafter_tpu.ops.splat import forward_warp_batch
from trajectorycrafter_tpu.orchestrator import TrajCrafter


def align_depth_scale(
    depth_new: np.ndarray, depth_ref: np.ndarray, mask: Optional[np.ndarray] = None
) -> float:
    """Robust scale between two depth maps: IQR-filtered median ratio
    (reference utils_autoregressive.py:128-185)."""
    a = depth_new.reshape(-1)
    b = depth_ref.reshape(-1)
    if mask is not None:
        keep = mask.reshape(-1) > 0.5
        a, b = a[keep], b[keep]
    ok = (a > 1e-6) & (b > 1e-6) & np.isfinite(a) & np.isfinite(b)
    if ok.sum() < 16:
        return 1.0
    ratio = b[ok] / a[ok]
    q1, q3 = np.percentile(ratio, [25, 75])
    iqr = q3 - q1
    inlier = (ratio >= q1 - 1.5 * iqr) & (ratio <= q3 + 1.5 * iqr)
    if inlier.sum() == 0:
        return float(np.median(ratio))
    return float(np.median(ratio[inlier]))


def split_trajectory(total_poses: jnp.ndarray, n_splits: int, seg_len: int,
                     overlap: int) -> List[np.ndarray]:
    """Index windows covering the full pose list with ``overlap`` shared
    frames between consecutive segments."""
    n = total_poses.shape[0]
    step = seg_len - overlap
    starts = list(range(0, max(n - seg_len, 0) + 1, step))
    if starts[-1] + seg_len < n:
        starts.append(n - seg_len)
    return [np.arange(s, s + seg_len) for s in starts]


class TrajCrafterAutoregressive(TrajCrafter):
    """v1: pose-continuation segmentation (reference core_autoregressive.py)."""

    def infer_autoregressive(
        self,
        n_splits: int = 4,
        overlap_frames: int = 8,
        theta: float = 180.0,
        phi: float = 0.0,
        d_r: float = 0.0,
    ) -> np.ndarray:
        cfg = self.cfg
        seg_len = cfg.video_length
        total = n_splits * (seg_len - overlap_frames) + overlap_frames

        frames = self._load_frames()
        prompt = self.models.get_caption(frames[seg_len // 2]) + cfg.diffusion.refine_prompt
        depths = self._estimate_depth(frames)
        from trajectorycrafter_tpu.geometry.cameras import pose_radius_from_depth

        radius = pose_radius_from_depth(depths[0, 0], cfg.render.radius_scale)
        poses_all = generate_traj_specified(
            default_c2w(), theta, phi, d_r * radius, 0.0, 0.0, total
        )
        poses_all = poses_all.at[:, 2, 3].add(radius)
        K = jnp.tile(
            intrinsics_matrix(cfg.render.focal, cfg.render.cx, cfg.render.cy)[None],
            (seg_len, 1, 1),
        )
        windows = split_trajectory(poses_all, n_splits, seg_len, overlap_frames)

        out_segments: List[np.ndarray] = []
        cur_frames = frames
        cur_depths = depths
        for wi, win in enumerate(windows):
            pose_t = poses_all[win]
            # anchor: segment's first pose (continuation of the chain,
            # reference _get_poses_with_continuation :173-235)
            pose_s = jnp.tile(pose_t[0:1], (seg_len, 1, 1))
            warped, masks, _, _ = forward_warp_batch(
                jnp.asarray(cur_frames * 2.0 - 1.0), jnp.asarray(cur_depths[:, 0]),
                pose_s, pose_t, K, use_mask_clean=cfg.render.mask,
            )
            cond = (np.asarray(warped) + 1.0) / 2.0
            gen = self._diffuse_and_save(
                cur_frames, cond, np.asarray(masks), prompt,
                ref_slice=slice(0, cfg.diffusion.ref_frames),
            )
            out_segments.append(gen if wi == 0 else gen[overlap_frames:])
            if wi + 1 < len(windows):
                # feed the generated segment forward (reference :95-107)
                import cv2

                cur_frames = np.stack([
                    cv2.resize(fr, (cfg.warp_size[1], cfg.warp_size[0]),
                               interpolation=cv2.INTER_LINEAR)
                    for fr in np.asarray(gen, np.float32)
                ])
                cur_depths = self._estimate_depth(cur_frames)
        return np.concatenate(out_segments, axis=0)


class TrajCrafterGlobalPointCloud(TrajCrafter):
    """v2: global point-cloud autoregression (reference
    autoregressive_global.py:42-344)."""

    def infer_autoregressive(
        self,
        n_splits: int = 4,
        overlap_frames: int = 8,
        theta: float = 180.0,
        phi: float = 0.0,
        d_r: float = 0.0,
        max_points: int = 4_000_000,
    ) -> np.ndarray:
        cfg = self.cfg
        seg_len = cfg.video_length
        total = n_splits * (seg_len - overlap_frames) + overlap_frames
        hw, ww = cfg.warp_size

        frames = self._load_frames()
        prompt = self.models.get_caption(frames[seg_len // 2]) + cfg.diffusion.refine_prompt
        depths = self._estimate_depth(frames)
        from trajectorycrafter_tpu.geometry.cameras import pose_radius_from_depth

        radius = pose_radius_from_depth(depths[0, 0], cfg.render.radius_scale)
        K = intrinsics_matrix(cfg.render.focal, cfg.render.cx, cfg.render.cy)

        # input frames observed from the anchor camera
        anchor = default_c2w().at[2, 3].add(radius)
        c2ws_in = jnp.tile(anchor[None], (seg_len, 1, 1))
        Ks = jnp.tile(K[None], (seg_len, 1, 1))
        points, colors = lift_video_to_pointcloud(
            jnp.asarray(frames), jnp.asarray(depths[:, 0]), Ks, c2ws_in
        )

        poses_all = generate_traj_specified(
            default_c2w(), theta, phi, d_r * radius, 0.0, 0.0, total
        )
        poses_all = poses_all.at[:, 2, 3].add(radius)
        windows = split_trajectory(poses_all, n_splits, seg_len, overlap_frames)

        out_segments: List[np.ndarray] = []
        for wi, win in enumerate(windows):
            pose_t = poses_all[win]
            # render every target view directly from the global cloud
            renders, masks_l, depths_l = [], [], []
            for i in range(seg_len):
                w2c = jnp.linalg.inv(pose_t[i])
                img, dpt, msk = render_zbuffer(points, colors, K, w2c, hw, ww)
                renders.append(np.asarray(img))
                depths_l.append(np.asarray(dpt))
                masks_l.append(np.asarray(msk))
            cond = np.stack(renders)
            masks = np.stack(masks_l)
            gen = self._diffuse_and_save(
                cond, cond, masks, prompt,
                ref_slice=slice(0, cfg.diffusion.ref_frames),
            )
            out_segments.append(gen if wi == 0 else gen[overlap_frames:])

            if wi + 1 < len(windows):
                # re-lift the generated segment into the cloud with robust
                # depth-scale alignment (reference :318-344)
                import cv2

                gen_w = np.stack([
                    cv2.resize(fr, (ww, hw), interpolation=cv2.INTER_LINEAR)
                    for fr in np.asarray(gen, np.float32)
                ])
                gen_depth = self._estimate_depth(gen_w)[:, 0]
                rend_depth = np.stack(depths_l)
                scale = align_depth_scale(gen_depth, rend_depth, masks)
                new_pts, new_cols = lift_video_to_pointcloud(
                    jnp.asarray(gen_w), jnp.asarray(gen_depth * scale),
                    jnp.tile(K[None], (seg_len, 1, 1)), pose_t,
                )
                points, colors = merge_pointclouds([points, new_pts],
                                                   [colors, new_cols])
                if points.shape[0] > max_points:
                    from trajectorycrafter_tpu.geometry.pointcloud import (
                        downsample_pointcloud,
                    )

                    points, colors = downsample_pointcloud(
                        points, colors, max_points, jax.random.PRNGKey(wi)
                    )

        # scene export: COLMAP text model + PLY + self-contained interactive
        # HTML viewer (reference autoregressive_global.py:109-136 saves
        # COLMAP; the viser notebooks' live inspection becomes the HTML file)
        import os

        from trajectorycrafter_tpu.utils.export import (
            save_colmap, save_html_viewer, save_ply,
        )

        scene_dir = os.path.join(cfg.save_dir, "scene")
        pts_np, cols_np = np.asarray(points), np.asarray(colors)
        c2ws_np = [np.asarray(p) for p in poses_all]
        Ks_np = [np.asarray(K)] * len(c2ws_np)
        save_ply(os.path.join(scene_dir, "points.ply"), pts_np, cols_np)
        save_colmap(scene_dir, Ks_np, c2ws_np, ww, hw, pts_np, cols_np)
        save_html_viewer(os.path.join(scene_dir, "viewer.html"), pts_np,
                         cols_np, c2ws_np, Ks_np, height=hw)
        return np.concatenate(out_segments, axis=0)
