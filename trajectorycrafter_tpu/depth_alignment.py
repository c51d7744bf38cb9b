"""Consistent-depth optimization (SURVEY 2.17).

TPU-native rebuild of notebooks/12_11_25_consistent_depth/: test-time
optimization that aligns estimated video depth to rendered/warped reference
depth with scale-shift-invariant and temporal-alignment-error (TAE) losses
(consistent_depth.py:34-46, depth_losses.py), windowed over the video
(INFER_LEN=32, OVERLAP=10 defaults, consistent_depth.py:43-47), and an
autoregressive loop that glues aligned depth into the global point cloud
(autoregressive_loop_alignment.py:17-44).

Two alignment mechanisms, mirroring the reference's two layers:

* :func:`align_window` — lightweight per-frame scale/shift optimisation
  against rendered depth (no model in the loop);
* :class:`DepthAlignmentTrainer` — the full test-time optimisation of
  depth_alignment/depth_trainer.py:51-144: a learnable *visual prompt*
  (additive RGB perturbation) is optimised through a frozen
  Video-Depth-Anything model; scale/shift is solved in closed form each
  step (compute_scale_and_shift) and the loss combines masked L1+RMSE
  (depth_losses.py SimpleDepthLoss), an SSI term, and the differentiable
  geometric TAE (depth_losses.py DifferentiableTAELoss: unproject frame i,
  transform with the relative pose, project into frame i+1, bilinear-sample
  its depth and penalise relative disagreement).

The reference optimises with torch Adam/AdamW per window; here every
optimisation loop is jit-compiled optax under ``lax.scan``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

INFER_LEN = 32
OVERLAP = 10


class AlignParams(NamedTuple):
    log_scale: jnp.ndarray  # (F,) per-frame log scale
    shift: jnp.ndarray  # (F,) per-frame shift


def scale_shift_invariant_loss(pred: jnp.ndarray, target: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """SSI depth loss in disparity space (Midas-style)."""
    eps = 1e-6
    d_p = 1.0 / jnp.maximum(pred, eps)
    d_t = 1.0 / jnp.maximum(target, eps)
    w = mask / jnp.maximum(mask.sum(axis=(-2, -1), keepdims=True), 1.0)
    mu_p = (w * d_p).sum(axis=(-2, -1), keepdims=True)
    mu_t = (w * d_t).sum(axis=(-2, -1), keepdims=True)
    s_p = (w * jnp.abs(d_p - mu_p)).sum(axis=(-2, -1), keepdims=True) + eps
    s_t = (w * jnp.abs(d_t - mu_t)).sum(axis=(-2, -1), keepdims=True) + eps
    return jnp.mean(jnp.sum(w * jnp.abs((d_p - mu_p) / s_p - (d_t - mu_t) / s_t),
                            axis=(-2, -1)))


def temporal_alignment_error(depth: jnp.ndarray) -> jnp.ndarray:
    """TAE: mean relative frame-to-frame depth change (lower = smoother)."""
    eps = 1e-6
    rel = jnp.abs(depth[1:] - depth[:-1]) / jnp.maximum(depth[:-1], eps)
    return jnp.mean(rel)


def apply_alignment(depth: jnp.ndarray, params: AlignParams) -> jnp.ndarray:
    scale = jnp.exp(params.log_scale)[:, None, None]
    return depth * scale + params.shift[:, None, None]


@partial(jax.jit, static_argnames=("steps", "ssi_weight"))
def align_window(
    depth: jnp.ndarray,  # (F, H, W) estimated depth
    ref_depth: jnp.ndarray,  # (F, H, W) rendered/warped reference depth
    mask: jnp.ndarray,  # (F, H, W) validity of ref_depth
    steps: int = 200,
    lr: float = 0.05,
    tae_weight: float = 0.1,
    ssi_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimise per-frame (scale, shift) so depth matches ref where valid and
    stays temporally smooth -> (aligned_depth, final_loss).

    ``ssi_weight`` adds the scale-shift-invariant disparity term on top of
    the masked L1 (reference uses both, depth_losses.py)."""
    f = depth.shape[0]
    params = AlignParams(jnp.zeros((f,)), jnp.zeros((f,)))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        aligned = apply_alignment(depth, p)
        data = jnp.sum(mask * jnp.abs(aligned - ref_depth)) / jnp.maximum(mask.sum(), 1.0)
        loss = data + tae_weight * temporal_alignment_error(aligned)
        if ssi_weight > 0.0:
            loss = loss + ssi_weight * scale_shift_invariant_loss(
                aligned, ref_depth, mask)
        return loss

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=steps)
    return apply_alignment(depth, params), losses[-1]


def estimate_depth_with_alignment(
    depths: np.ndarray,  # (F, H, W) raw estimated depth for the whole video
    ref_depths: np.ndarray,  # (F, H, W) reference (rendered) depth
    ref_masks: np.ndarray,  # (F, H, W)
    infer_len: int = INFER_LEN,
    overlap: int = OVERLAP,
    steps: int = 200,
) -> np.ndarray:
    """Windowed alignment over an arbitrary-length video
    (reference consistent_depth.py:236-...): consecutive windows share
    ``overlap`` frames whose alignment is ramp-blended."""
    f = depths.shape[0]
    infer_len = min(infer_len, f)
    stride = max(infer_len - overlap, 1)
    starts = list(range(0, max(f - infer_len, 0) + 1, stride))
    if starts[-1] + infer_len < f:
        starts.append(f - infer_len)

    out = np.zeros_like(depths)
    weight = np.zeros((f, 1, 1), np.float32)
    prev_start = None
    for s in starts:
        aligned, _ = align_window(
            jnp.asarray(depths[s : s + infer_len]),
            jnp.asarray(ref_depths[s : s + infer_len]),
            jnp.asarray(ref_masks[s : s + infer_len]),
            steps=steps,
        )
        # positional overlap (the tail catch-up window overlaps more than
        # ``overlap`` frames)
        ov = 0
        if prev_start is not None:
            ov = min(max(prev_start + infer_len - s, 0), infer_len)
        ramp = np.ones((infer_len, 1, 1), np.float32)
        if ov > 0:
            ramp[:ov, 0, 0] = np.linspace(0, 1, ov + 2)[1:-1]
        out[s : s + infer_len] += np.asarray(aligned) * ramp
        weight[s : s + infer_len] += ramp
        prev_start = s
    return out / np.maximum(weight, 1e-8)


def compute_scale_and_shift(pred: jnp.ndarray, target: jnp.ndarray,
                            mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form masked least-squares (scale, shift) so that
    ``scale * pred + shift ~ target`` (the MiDaS system the reference calls
    as Video-Depth-Anything's ``compute_scale_and_shift``,
    depth_trainer.py:82-83).

    Reduces over every axis but the first: pred/target/mask (B, ...) ->
    scale/shift (B,).  Frames share one solution when the video is flattened
    into the reduction axes (the reference flattens (T, H) together).
    """
    axes = tuple(range(1, pred.ndim))
    m = mask.astype(pred.dtype)
    a00 = jnp.sum(m * pred * pred, axis=axes)
    a01 = jnp.sum(m * pred, axis=axes)
    a11 = jnp.sum(m, axis=axes)
    b0 = jnp.sum(m * pred * target, axis=axes)
    b1 = jnp.sum(m * target, axis=axes)
    det = a00 * a11 - a01 * a01
    ok = det > 1e-8
    scale = jnp.where(ok, (a11 * b0 - a01 * b1) / jnp.where(ok, det, 1.0), 1.0)
    shift = jnp.where(ok, (-a01 * b0 + a00 * b1) / jnp.where(ok, det, 1.0), 0.0)
    return scale, shift


def _bilinear_sample(img: jnp.ndarray, u: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at pixel coords (u, v) with border padding
    (torch grid_sample align_corners=True + padding_mode='border')."""
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    u1 = jnp.clip(u0 + 1, 0, w - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    fu = u - u0
    fv = v - v0
    top = img[v0, u0] * (1 - fu) + img[v0, u1] * fu
    bot = img[v1, u0] * (1 - fu) + img[v1, u1] * fu
    return top * (1 - fv) + bot * fv


def differentiable_tae(
    depth: jnp.ndarray,  # (F, H, W)
    intrinsics: jnp.ndarray,  # (3, 3)
    extrinsics: jnp.ndarray,  # (F, 4, 4) camera-to-world poses
    mask_threshold: float = 1e-3,
    max_depth: float = 100.0,
) -> jnp.ndarray:
    """Differentiable geometric TAE (depth_losses.py:106-228): each frame's
    depth is unprojected, moved into the next camera with the relative pose,
    re-projected, and compared (relative error) against the bilinear-sampled
    depth of the next frame.  Returns the mean over valid pixels and frame
    pairs."""
    f, h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    xs = jnp.arange(w, dtype=depth.dtype)[None, :]
    ys = jnp.arange(h, dtype=depth.dtype)[:, None]

    rel = jnp.einsum("fij,fjk->fik", jnp.linalg.inv(extrinsics[1:]),
                     extrinsics[:-1])  # T_{i+1}^{-1} @ T_i

    def pair(d1, d2, t_rel):
        r, t = t_rel[:3, :3], t_rel[:3, 3]
        x1 = (xs - cx) * d1 / fx
        y1 = (ys - cy) * d1 / fy
        pts = jnp.stack([x1, y1, d1], axis=-1)  # (H, W, 3)
        p2 = jnp.einsum("ij,hwj->hwi", r, pts) + t
        z2 = jnp.maximum(p2[..., 2], 1e-6)
        u2 = fx * p2[..., 0] / z2 + cx
        v2 = fy * p2[..., 1] / z2 + cy
        valid = ((d1 > mask_threshold) & (d1 < max_depth)
                 & (u2 >= 0) & (u2 < w) & (v2 >= 0) & (v2 < h)
                 & (p2[..., 2] > mask_threshold))
        sampled = _bilinear_sample(d2, u2, v2)
        err = jnp.abs(p2[..., 2] - sampled) / (sampled + 1e-6)
        m = valid.astype(depth.dtype)
        return jnp.sum(err * m) / (jnp.sum(m) + 1e-6)

    errs = jax.vmap(pair)(depth[:-1], depth[1:], rel)
    return jnp.mean(errs)


def evaluate_tae(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                 extrinsics: jnp.ndarray) -> float:
    """Symmetric (both directions) TAE metric (consistent_depth.py:323-388)."""
    fwd = differentiable_tae(depth, intrinsics, extrinsics)
    bwd = differentiable_tae(depth[::-1], intrinsics, extrinsics[::-1])
    return float((fwd + bwd) / 2.0)


class DepthAlignmentTrainer:
    """Test-time visual-prompt optimisation through a frozen VDA model
    (depth_trainer.py DepthAlignmentTrainer).

    ``mode='VP'`` optimises an additive RGB prompt (the reference default,
    consistent_depth.py Arguments.mode); ``mode='FT'`` fine-tunes the model
    parameters themselves.  The whole epoch loop runs as one jit-compiled
    ``lax.scan``.
    """

    def __init__(self, model, params, lr: float = 2e-3,
                 simple_weight: float = 1.0, ssi_weight: float = 1.0,
                 tae_weight: float = 0.0, mode: str = "VP",
                 depth_scale: float = 10000.0):
        self.model = model
        self.params = params
        self.lr = lr
        self.simple_weight = simple_weight
        self.ssi_weight = ssi_weight
        self.tae_weight = tae_weight
        self.depth_scale = depth_scale
        if mode not in ("VP", "FT"):
            raise ValueError(f"mode must be 'VP' or 'FT', got {mode!r}")
        self.mode = mode
        self._run = self._build_run()

    def _loss(self, depth_inv, sparse_inv, mask, intrinsics, extrinsics,
              use_tae: bool):
        """Combined loss on inverse depth (depth_losses.py
        CombinedDepthLossWithTAE: simple L1+RMSE + VDA-style SSI + TAE).

        The TAE term operates on METRIC depth recovered via ``depth_scale``:
        the reference feeds raw inverse depth into its DifferentiableTAELoss,
        whose (1e-3, 100) validity window then rejects scaled-disparity
        values wholesale (the term also ships weight 0.0 there,
        depth_trainer.py:43) -- converting first makes the loss live when
        ``tae_weight`` is enabled."""
        m = mask.astype(depth_inv.dtype)
        denom = jnp.maximum(m.sum(), 1.0)
        l1 = jnp.sum(m * jnp.abs(depth_inv - sparse_inv)) / denom
        rmse = jnp.sqrt(jnp.sum(m * (depth_inv - sparse_inv) ** 2) / denom)
        loss = self.simple_weight * (l1 + rmse)
        if self.ssi_weight > 0.0:
            # operate on disparity directly: the SSI helper inverts its
            # inputs, so pass depth = 1/disparity
            ssi = scale_shift_invariant_loss(
                1.0 / jnp.maximum(depth_inv, 1e-6),
                1.0 / jnp.maximum(sparse_inv, 1e-6), m)
            loss = loss + self.ssi_weight * ssi
        if self.tae_weight > 0.0 and use_tae:
            metric = jnp.where(depth_inv > 1e-6,
                               self.depth_scale / jnp.maximum(depth_inv, 1e-6),
                               0.0)
            loss = loss + self.tae_weight * differentiable_tae(
                metric, intrinsics, extrinsics)
        return loss

    def _build_run(self):
        """One jitted optimisation program per trainer: data enters as
        arguments (not traced constants), so consecutive stages with the
        same shapes hit the jit cache instead of recompiling the whole
        epochs-long scan through the model each call."""
        model = self.model

        def predict(p, prompt, frames, sparse, mask):
            d = model.apply({"params": p}, (frames + prompt)[None])[0]
            scale, shift = compute_scale_and_shift(
                d.reshape(1, -1), sparse.reshape(1, -1), mask.reshape(1, -1))
            return d * scale[0] + shift[0], scale[0], shift[0]

        def run(params, frames, sparse, mask, intrinsics, extrinsics,
                epochs, use_tae):
            def loss_fn(theta):
                p, prompt = theta
                d, _, _ = predict(p, prompt, frames, sparse, mask)
                return self._loss(d, sparse, mask, intrinsics, extrinsics,
                                  use_tae)

            prompt0 = jnp.zeros_like(frames)
            theta = (params, prompt0)
            # freeze one half of theta with a zero-update transform
            lbl_params = jax.tree.map(
                lambda _: "train" if self.mode == "FT" else "freeze", params)
            lbl_prompt = "train" if self.mode == "VP" else "freeze"
            opt = optax.multi_transform(
                {"train": optax.adamw(self.lr), "freeze": optax.set_to_zero()},
                (lbl_params, lbl_prompt),
            )
            state = opt.init(theta)

            def step(carry, _):
                th, st = carry
                loss, g = jax.value_and_grad(loss_fn)(th)
                updates, st = opt.update(g, st, th)
                th = optax.apply_updates(th, updates)
                return (th, st), loss

            (theta, _), losses = jax.lax.scan(step, (theta, state), None,
                                              length=epochs)
            final_p, final_prompt = theta
            d, scale, shift = predict(final_p, final_prompt, frames, sparse,
                                      mask)
            return d, final_prompt, scale, shift, losses

        return jax.jit(run, static_argnames=("epochs", "use_tae"))

    def train(
        self,
        frames_im: jnp.ndarray,  # (F, H, W, 3) ImageNet-normalised
        sparse_depth_inv: jnp.ndarray,  # (F, H, W) inverse-depth target
        sparse_mask: jnp.ndarray,  # (F, H, W) validity
        intrinsics: jnp.ndarray = None,  # (3, 3)
        extrinsics: jnp.ndarray = None,  # (F, 4, 4)
        epochs: int = 50,
    ):
        """-> (corrected inverse depth (F, H, W), visual prompt, scale, shift).

        Mirrors depth_trainer.py:51-144: per step the frozen model runs on
        ``frames + prompt``, scale/shift is solved in closed form over the
        whole clip, and the combined loss drives AdamW on the prompt (VP)
        or the parameters (FT).
        """
        frames = jnp.asarray(frames_im)
        sparse = jnp.asarray(sparse_depth_inv)
        mask = jnp.asarray(sparse_mask)
        use_tae = intrinsics is not None
        f = frames.shape[0]
        if use_tae:
            intrinsics = jnp.asarray(intrinsics)
            extrinsics = jnp.asarray(extrinsics)
        else:  # shape-stable dummies keep the jit signature uniform
            intrinsics = jnp.eye(3)
            extrinsics = jnp.tile(jnp.eye(4)[None], (f, 1, 1))

        d, prompt, scale, shift, losses = self._run(
            self.params, frames, sparse, mask, intrinsics, extrinsics,
            epochs, use_tae and self.tae_weight > 0.0)
        self._last_losses = np.asarray(losses)
        return d, prompt, float(scale), float(shift)


def align_video_to_pointcloud(
    frames: np.ndarray,  # (F, H, W, 3)
    depths: np.ndarray,  # (F, H, W) raw estimates
    intrinsics: np.ndarray,  # (F, 3, 3)
    c2ws: np.ndarray,  # (F, 4, 4)
    points: jnp.ndarray,
    colors: jnp.ndarray,
    steps: int = 200,
):
    """Render the global cloud into each camera, align the estimated depth to
    the rendered depth, and return (aligned_depths, new cloud contribution)
    (reference autoregressive_loop_alignment.py:455-631)."""
    from trajectorycrafter_tpu.geometry.pointcloud import (
        lift_video_to_pointcloud,
        render_zbuffer,
    )

    f, h, w = depths.shape
    ref_d, ref_m = [], []
    for i in range(f):
        w2c = jnp.linalg.inv(jnp.asarray(c2ws[i]))
        _, d, m = render_zbuffer(points, colors, jnp.asarray(intrinsics[i]),
                                 w2c, h, w)
        ref_d.append(np.asarray(d))
        ref_m.append(np.asarray(m))
    aligned = estimate_depth_with_alignment(
        depths, np.stack(ref_d), np.stack(ref_m), steps=steps
    )
    new_pts, new_cols = lift_video_to_pointcloud(
        jnp.asarray(frames), jnp.asarray(aligned),
        jnp.asarray(intrinsics), jnp.asarray(c2ws),
    )
    return aligned, (new_pts, new_cols)
