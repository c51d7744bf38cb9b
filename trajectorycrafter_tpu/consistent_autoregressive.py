"""Alignment-driven autoregressive generation (SURVEY 2.17 glue).

TPU-native rebuild of the reference's consistent-depth autoregressive driver
(notebooks/12_11_25_consistent_depth/autoregressive_alignment/
main_alignment.py + autoregressive_loop_alignment.py): long trajectories are
generated segment by segment against *per-frame* global point clouds, and
each new segment's depth is test-time-aligned to the depth rendered from
those clouds before being merged back, keeping the world geometry consistent
across segments.

Per stage (autoregressive_loop_alignment.py:631-759 ``autoregressive_loop``):

  1. (stage > 0) ``align_video_to_pc``: render sparse depth + masks from the
     per-frame global clouds at the source poses (:572-621, z-buffer with
     point_size 2 + morphological mask opening), test-time-optimise the
     depth estimate against it at half resolution (:236-349,
     ``estimate_depth_with_alignment``: resize by ``resize_factor`` snapped
     to a multiple of 14, closed-form scale/shift + visual-prompt training),
     unproject the source frames with the aligned depth and merge into the
     clouds with a random 2x downsample (:545-569);
  2. reverse the cloud frame order every even stage (:706-710);
  3. render the target views from the clouds, clean masks, and diffuse
     (:725-755);
  4. the generated segment becomes the next stage's source video
     (main_alignment.py:269-317, kept in memory instead of the reference's
     gen.mp4 round-trip).

Depth is carried as metric depth; the VDA estimator produces inverse depth
which is converted with ``depth_scale`` (main_alignment.py:192,
``invert_depth_with_scale``).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.depth_alignment import DepthAlignmentTrainer
from trajectorycrafter_tpu.geometry.cameras import (
    default_c2w,
    intrinsics_matrix,
    pose_radius_from_depth,
)
from trajectorycrafter_tpu.geometry.pointcloud import (
    downsample_pointcloud,
    lift_to_pointcloud,
    render_zbuffer,
)
from trajectorycrafter_tpu.geometry.trajectory import generate_traj_specified
from trajectorycrafter_tpu.models.vda import normalize_imagenet
from trajectorycrafter_tpu.ops.morphology import mask_open
from trajectorycrafter_tpu.ops.resize import resize_linear, resize_nearest
from trajectorycrafter_tpu.orchestrator import TrajCrafter

DEPTH_SCALE = 10000.0  # main_alignment.py:192


def invert_depth_with_scale(depth: jnp.ndarray, scale: float = DEPTH_SCALE,
                            eps: float = 1e-8) -> jnp.ndarray:
    """depth <-> scaled inverse depth, preserving zeros
    (autoregressive_loop_alignment.py:46-53)."""
    return jnp.where(depth > eps, scale / jnp.maximum(depth, eps), 0.0)


def render_video_from_pcs(
    pcs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    poses: jnp.ndarray,  # (F, 4, 4) c2w
    intrinsic: jnp.ndarray,  # (3, 3)
    hw: Tuple[int, int],
    point_size: int = 2,
    mask_kernel: int = 9,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render each frame's cloud into its camera -> (images, depths, masks);
    masks are cleaned with a morphological opening and applied to image and
    depth (autoregressive_loop_alignment.py:572-621)."""
    imgs, depths, masks = [], [], []
    for i in range(poses.shape[0]):
        pts, cols = pcs[i]
        w2c = jnp.linalg.inv(poses[i])
        img, dpt, msk = render_zbuffer(pts, cols, intrinsic, w2c, hw[0], hw[1],
                                       point_size=point_size)
        cleaned = mask_open(msk, size=mask_kernel, n_erosion=1, n_dilation=1)
        imgs.append(np.asarray(img * cleaned[..., None]))
        depths.append(np.asarray(dpt * cleaned))
        masks.append(np.asarray(cleaned))
    return np.stack(imgs), np.stack(depths), np.stack(masks)


def lift_video_to_pcs(
    frames: jnp.ndarray,  # (F, H, W, 3) in [0, 1]
    depths: jnp.ndarray,  # (F, H, W) metric depth
    intrinsic: jnp.ndarray,  # (3, 3)
    poses: jnp.ndarray,  # (F, 4, 4) c2w
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-frame unprojection (autoregressive_loop_alignment.py:17-41
    ``video_to_pcs`` keeps one cloud per frame, unlike the v2 global merge).

    Pixels with invalid (zero) depth -- the VDA path emits exact zeros for
    invalid disparity -- are parked at NaN instead of the camera origin:
    NaN coordinates fail every bounds comparison in render_zbuffer, so the
    points are culled rather than rendered as near occluders."""
    out = []
    for i in range(frames.shape[0]):
        pts, cols = lift_to_pointcloud(frames[i], depths[i], intrinsic, poses[i])
        valid = (depths[i] > 1e-6).reshape(-1, 1)
        pts = jnp.where(valid, pts, jnp.nan)
        out.append((pts, cols))
    return out


def merge_pcs_downsample(
    global_pcs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    new_pcs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    key: jax.Array,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Concatenate per-frame clouds and randomly keep half
    (autoregressive_loop_alignment.py:553-567)."""
    merged = []
    for i, ((gp, gc), (sp, sc)) in enumerate(zip(global_pcs, new_pcs)):
        pts = jnp.concatenate([gp, sp], axis=0)
        cols = jnp.concatenate([gc, sc], axis=0)
        key, sub = jax.random.split(key)
        pts, cols = downsample_pointcloud(pts, cols, pts.shape[0] // 2, sub)
        merged.append((pts, cols))
    return merged


def _snap(v: int, multiple: int) -> int:
    return max((v // multiple) * multiple, multiple)


def estimate_depth_with_prompt_alignment(
    frames01: np.ndarray,  # (F, H, W, 3) in [0, 1]
    sparse_depth: np.ndarray,  # (F, H, W) metric, 0 = invalid
    sparse_mask: np.ndarray,  # (F, H, W)
    intrinsic: np.ndarray,  # (3, 3)
    extrinsics: np.ndarray,  # (F, 4, 4)
    trainer: DepthAlignmentTrainer,
    depth_scale: float = DEPTH_SCALE,
    resize_factor: int = 2,
    multiple_of: int = 14,
    epochs: int = 50,
) -> np.ndarray:
    """Full-resolution metric depth aligned to the rendered sparse depth
    (autoregressive_loop_alignment.py:236-349): optimisation runs at
    1/resize_factor resolution snapped to a multiple of 14 (ViT patches),
    in inverse-depth space, then is resized back and re-inverted."""
    f, h, w, _ = frames01.shape
    hr = _snap(h // resize_factor, multiple_of)
    wr = _snap(w // resize_factor, multiple_of)

    frames_r = resize_linear(
        jnp.moveaxis(jnp.asarray(frames01), -1, 1), (hr, wr)
    )  # (F, 3, hr, wr)
    frames_r = jnp.moveaxis(frames_r, 1, -1)
    sparse_r = resize_linear(jnp.asarray(sparse_depth), (hr, wr))
    mask_r = resize_nearest(jnp.asarray(sparse_mask), (hr, wr)) > 0.5
    # zero depth outside the resized mask, then re-derive the mask from the
    # surviving positive depths (:293-297)
    sparse_r = sparse_r * mask_r
    mask_r = sparse_r > 0

    k = np.asarray(intrinsic).copy()
    k[0, :] *= wr / w
    k[1, :] *= hr / h

    depth_inv, _, _, _ = trainer.train(
        normalize_imagenet(frames_r),
        invert_depth_with_scale(sparse_r, depth_scale),
        mask_r,
        intrinsics=jnp.asarray(k),
        extrinsics=jnp.asarray(extrinsics),
        epochs=epochs,
    )
    depth_inv_full = resize_linear(depth_inv, (h, w))
    return np.asarray(invert_depth_with_scale(depth_inv_full, depth_scale))


class TrajCrafterConsistentDepth(TrajCrafter):
    """Consistent-depth autoregressive orchestrator (main_alignment.py driver).

    ``vda`` is an optional (model, params) pair; without it the segment
    depth comes from the bundle's default estimator (DepthCrafter) and the
    lightweight scale/shift alignment path is used instead of the
    visual-prompt trainer.
    """

    def __init__(self, cfg, models=None, vda=None, align_epochs: int = 50,
                 resize_factor: int = 2, depth_scale: float = DEPTH_SCALE,
                 tae_weight: float = 0.0):
        super().__init__(cfg, models)
        self.vda = vda
        self.align_epochs = align_epochs
        self.resize_factor = resize_factor
        self.depth_scale = depth_scale
        if vda is not None:
            # forward depth_scale so the trainer's metric-space TAE inverts
            # with the SAME scale the sparse targets were built with
            self.trainer = DepthAlignmentTrainer(
                vda[0], vda[1], depth_scale=depth_scale,
                tae_weight=tae_weight)
        else:
            self.trainer = None

    # -- depth ---------------------------------------------------------------
    def _segment_depth(self, frames01: np.ndarray) -> np.ndarray:
        """(F, H, W) metric depth for a segment (estimate_depth_without_
        alignment, autoregressive_loop_alignment.py:184-233: reflect-pad to a
        multiple of 14, VDA forward, invert with depth_scale, crop)."""
        if self.vda is None:
            return self._estimate_depth(frames01)[:, 0]
        from trajectorycrafter_tpu.models.vda import infer_video_depth

        model, params = self.vda
        f, h, w, _ = frames01.shape
        ph = (-h) % 14
        pw = (-w) % 14
        top, left = ph // 2, pw // 2
        x = jnp.pad(jnp.asarray(frames01),
                    ((0, 0), (top, ph - top), (left, pw - left), (0, 0)),
                    mode="reflect")
        # windowed 32/10 chaining for clips longer than the VDA context
        # (consistent_depth.py:43-47 INFER_LEN/OVERLAP)
        inv = infer_video_depth(model, params, normalize_imagenet(x))
        inv = inv[:, top : top + h, left : left + w]
        return np.asarray(invert_depth_with_scale(inv, self.depth_scale))

    def _align_video_to_pcs(self, frames01, poses_source, intrinsic,
                            global_pcs, key):
        """align_video_to_pc (autoregressive_loop_alignment.py:455-569):
        render sparse depth from the clouds, align a fresh estimate to it,
        lift and merge."""
        hw = frames01.shape[1:3]
        _, sparse_depth, sparse_mask = render_video_from_pcs(
            global_pcs, poses_source, intrinsic, hw)
        if self.trainer is not None:
            aligned = estimate_depth_with_prompt_alignment(
                frames01, sparse_depth, sparse_mask, np.asarray(intrinsic),
                np.asarray(poses_source), self.trainer,
                depth_scale=self.depth_scale,
                resize_factor=self.resize_factor, epochs=self.align_epochs)
        else:
            from trajectorycrafter_tpu.depth_alignment import (
                estimate_depth_with_alignment as align_scale_shift,
            )

            raw = self._segment_depth(frames01)
            aligned = align_scale_shift(raw, sparse_depth, sparse_mask,
                                        steps=self.align_epochs)
        new_pcs = lift_video_to_pcs(jnp.asarray(frames01),
                                    jnp.asarray(aligned), intrinsic,
                                    jnp.asarray(poses_source))
        return merge_pcs_downsample(global_pcs, new_pcs, key), aligned

    # -- driver --------------------------------------------------------------
    def infer_autoregressive(
        self,
        n_splits: int = 4,
        theta: float = 90.0,
        phi: float = 0.0,
        d_r: float = 0.0,
        d_x: float = 0.0,
        d_y: float = 0.0,
        save_stages: bool = True,
    ) -> np.ndarray:
        """Generate ``n_splits`` consecutive segments along the specified
        trajectory with consistent-depth point-cloud anchoring."""
        cfg = self.cfg
        seg_len = cfg.video_length
        hw, ww = cfg.warp_size

        frames = self._load_frames()  # (F, H, W, 3) in [0, 1]
        prompt = self.models.get_caption(frames[seg_len // 2]) + \
            cfg.diffusion.refine_prompt
        depths = self._segment_depth(frames)

        radius = pose_radius_from_depth(depths[0], cfg.render.radius_scale)
        K = intrinsics_matrix(cfg.render.focal, cfg.render.cx, cfg.render.cy)

        # target chain over all segments; source anchor = first target pose
        # (main_alignment.py:234-243)
        total = seg_len * n_splits
        poses_all = generate_traj_specified(
            default_c2w(), theta, phi, d_r * radius, d_x, d_y, total)
        poses_all = poses_all.at[:, 2, 3].add(radius)
        c2ws_init = jnp.tile(poses_all[0:1], (seg_len, 1, 1))

        global_pcs = lift_video_to_pcs(jnp.asarray(frames),
                                       jnp.asarray(depths), K, c2ws_init)

        out_segments: List[np.ndarray] = []
        cur_frames = frames
        poses_source = c2ws_init
        base_dir = cfg.save_dir
        key = jax.random.PRNGKey(cfg.seed)
        for stage in range(n_splits):
            poses_target = poses_all[stage * seg_len : (stage + 1) * seg_len]
            stage_dir = os.path.join(base_dir, f"stage_{stage:02d}")
            if save_stages:
                os.makedirs(stage_dir, exist_ok=True)
                np.save(os.path.join(stage_dir, "c2ws_target.npy"),
                        np.asarray(poses_target))
                np.save(os.path.join(stage_dir, "c2ws_source.npy"),
                        np.asarray(poses_source))

            if stage > 0:
                key, sub = jax.random.split(key)
                global_pcs, _ = self._align_video_to_pcs(
                    cur_frames, poses_source, K, global_pcs, sub)

            if stage % 2 == 0:
                # reverse the per-frame clouds (:706-710)
                global_pcs = global_pcs[::-1]

            renders, _, masks = render_video_from_pcs(
                global_pcs, poses_target, K, (hw, ww))

            cfg.save_dir = stage_dir if save_stages else base_dir
            try:
                gen = self._diffuse_and_save(
                    cur_frames, renders, masks, prompt,
                    ref_slice=slice(0, cfg.diffusion.ref_frames),
                )
            finally:
                cfg.save_dir = base_dir
            out_segments.append(gen)

            if stage + 1 < n_splits:
                import cv2

                cur_frames = np.stack([
                    cv2.resize(fr, (ww, hw), interpolation=cv2.INTER_LINEAR)
                    for fr in np.asarray(gen, np.float32)
                ])
                poses_source = poses_target
        return np.concatenate(out_segments, axis=0)
