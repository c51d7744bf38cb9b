"""Output-quality comparison: PSNR / SSIM between two generated videos.

Closes the operational loop on the opt-in int8 GEMM path (``--quant int8``,
docs/COVERAGE.md): quantization stays off by default because output parity
against real checkpoints cannot be validated offline (zero egress).  When
weights are reachable, run the same seed twice and compare:

    python -m trajectorycrafter_tpu.utils.quality a_gen.mp4 b_gen.mp4

The reference repo ships no quality metrics of its own (BASELINE.md); the
north-star acceptance bar is "PSNR-matched outputs at fixed seeds", so this
implements the standard formulations directly: PSNR over 8-bit range, and
per-frame grayscale SSIM (Wang et al. 2004 constants, 8x8 uniform windows)
aggregated over the video.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """PSNR in dB between same-shape uint8/float videos (any shape)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _ssim_frame(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    """Grayscale SSIM for one (H, W) frame; 8x8 non-overlapping windows.

    Uniform windows (the original paper's alternative to the gaussian) keep
    this dependency-free; for a/b relative comparisons the choice is
    immaterial.
    """
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    h, w = a.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError(f"frame {a.shape} smaller than the 8x8 SSIM window")
    a = a[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    b = b[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    a = a.reshape(bh * bw, 64)
    b = b.reshape(bh * bw, 64)
    mu_a, mu_b = a.mean(1), b.mean(1)
    va, vb = a.var(1), b.var(1)
    cov = ((a - mu_a[:, None]) * (b - mu_b[:, None])).mean(1)
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    return float(s.mean())


def ms_ssim(a: np.ndarray, b: np.ndarray, peak: float = 255.0,
            levels: int = 5) -> float:
    """Multi-scale SSIM between two (H, W) or (H, W, 3) frames.

    Offline-computable perceptual stand-in for the reference's LPIPS score
    (run_w_cam_poses_mvtracker_smooth.py:64-84 -- AlexNet LPIPS weights are
    unreachable with zero egress): Wang et al. 2003 MS-SSIM with the standard
    per-level exponents, 2x average-pool downsampling between levels.  Levels
    whose downsampled frame falls below the 8x8 SSIM window are dropped (with
    their exponents renormalised) so small eval crops still score.
    """
    weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3 and a.shape[-1] == 3:
        lum = np.array([0.299, 0.587, 0.114])
        a, b = a @ lum, b @ lum
    c2 = (0.03 * peak) ** 2
    vals, used = [], []
    for lvl in range(levels):
        if min(a.shape) < 16:  # SSIM window no longer fits
            break
        if lvl == levels - 1:
            vals.append(_ssim_frame(a, b, peak))  # full SSIM at last scale
        else:
            # contrast*structure term only: (2*cov + c2) / (va + vb + c2)
            h, w = a.shape
            bh, bw = h // 8, w // 8
            aa = a[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
            bb = b[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8)
            aa = aa.transpose(0, 2, 1, 3).reshape(bh * bw, 64)
            bb = bb.transpose(0, 2, 1, 3).reshape(bh * bw, 64)
            va, vb = aa.var(1), bb.var(1)
            cov = ((aa - aa.mean(1, keepdims=True))
                   * (bb - bb.mean(1, keepdims=True))).mean(1)
            vals.append(float(np.mean((2 * cov + c2) / (va + vb + c2))))
        used.append(weights[lvl])
        h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
        a = a[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
        b = b[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    if not vals:
        raise ValueError("frame too small for MS-SSIM (needs >= 16x16)")
    used = np.asarray(used) / np.sum(used)
    # negative contrast*structure terms (anticorrelated noise) clamp to 0
    return float(np.prod(np.maximum(vals, 0.0) ** used))


def video_quality(a: np.ndarray, b: np.ndarray,
                  peak: float = 255.0) -> Dict[str, float]:
    """PSNR + SSIM between two (F, H, W, C) videos (uint8 or [0, peak]).

    Returns overall psnr_db, per-frame min psnr, and mean/min per-frame SSIM
    on the luma.  The CLI's pass verdict gates on BOTH psnr_db and
    psnr_min_frame_db so one corrupted frame cannot be averaged away.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    frame_psnr = [psnr(x, y, peak) for x, y in zip(a, b)]
    # ITU-R BT.601 luma for SSIM (the standard grayscale reduction)
    if a.ndim == 4 and a.shape[-1] == 3:
        ga = a @ np.array([0.299, 0.587, 0.114])
        gb = b @ np.array([0.299, 0.587, 0.114])
    else:
        ga, gb = a.reshape(a.shape[:3]), b.reshape(b.shape[:3])
    frame_ssim = [_ssim_frame(x, y, peak) for x, y in zip(ga, gb)]
    return {
        "psnr_db": psnr(a, b, peak),
        "psnr_min_frame_db": float(min(frame_psnr)),
        "ssim": float(np.mean(frame_ssim)),
        "ssim_min_frame": float(min(frame_ssim)),
        "frames": int(a.shape[0]),
    }


def gate_metrics(m: Dict[str, float], psnr_pass_db: float) -> Dict[str, float]:
    """Apply the pass/fail gate to video_quality metrics, in place.

    Single source of truth for the acceptance criterion (CLI and
    bench_e2e's int8 A/B both call this): pass requires BOTH overall and
    weakest-frame PSNR above the bar, and infinite PSNR (identical videos)
    is capped at 99.0 dB so the JSON stays strict-parseable.
    """
    m["pass"] = bool(m["psnr_db"] >= psnr_pass_db
                     and m["psnr_min_frame_db"] >= psnr_pass_db)
    m["psnr_pass_db"] = float(psnr_pass_db)
    for k in ("psnr_db", "psnr_min_frame_db"):
        # cap only +inf (identical videos) at 99.0 so the JSON stays strict-
        # parseable; NaN (a failing metric) maps to 0.0 so the artifact never
        # shows a passing-looking score next to pass=false
        if np.isnan(m[k]):
            m[k] = 0.0
        elif np.isinf(m[k]):
            m[k] = 99.0
    return m


def main(argv=None) -> None:
    import argparse
    import json

    from trajectorycrafter_tpu.utils.video import f01_to_u8, read_video_frames

    p = argparse.ArgumentParser(
        description="PSNR/SSIM between two same-seed generated videos "
                    "(e.g. bf16 vs --quant int8)")
    p.add_argument("video_a")
    p.add_argument("video_b")
    p.add_argument("--psnr_pass_db", type=float, default=35.0,
                   help="exit non-zero if overall OR weakest-frame PSNR "
                        "falls below this")
    p.add_argument("--allow-frame-mismatch", action="store_true",
                   help="compare the common frame prefix instead of failing "
                        "when the two videos have different frame counts")
    args = p.parse_args(argv)

    # native resolution, every frame: quality judgment must see what was
    # actually written, not the loader's fixed decode resize
    a = read_video_frames(args.video_a, -1, width=None, height=None)
    b = read_video_frames(args.video_b, -1, width=None, height=None)
    if len(a) != len(b) and not args.allow_frame_mismatch:
        # a run that crashed partway and wrote fewer frames must not pass
        print(json.dumps({"pass": False, "error": "frame count mismatch",
                          "frames_a": int(len(a)), "frames_b": int(len(b))}))
        raise SystemExit(1)
    n = min(len(a), len(b))
    m = video_quality(f01_to_u8(a[:n]), f01_to_u8(b[:n]))
    if len(a) != len(b):
        m["frames_a"], m["frames_b"] = int(len(a)), int(len(b))
    gate_metrics(m, args.psnr_pass_db)
    print(json.dumps(m))
    if not m["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
