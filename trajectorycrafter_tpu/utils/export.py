"""Scene export: PLY point clouds and COLMAP-format cameras/points.

Replaces the reference's COLMAP-format saving in the global-point-cloud
orchestrator (autoregressive_global.py:109-136) and the viser notebook
visualisation (viser isn't a baked dependency; PLY/COLMAP files open in any
3D viewer / the COLMAP GUI).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def save_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    """Binary-less ascii PLY (points (N,3) float, colors (N,3) in [0,1])."""
    points = np.asarray(points, np.float32)
    colors = (np.clip(np.asarray(colors), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP quaternion (w, x, y, z)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * (1 if q[0] >= 0 else -1)


def save_colmap(
    out_dir: str,
    intrinsics: Sequence[np.ndarray],  # per-image (3, 3)
    c2ws: Sequence[np.ndarray],  # per-image (4, 4)
    width: int,
    height: int,
    points: np.ndarray = None,
    colors: np.ndarray = None,
    max_points: int = 200_000,
) -> None:
    """Write cameras.txt / images.txt / points3D.txt (COLMAP text model)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[fx fy cx cy]\n")
        for i, K in enumerate(intrinsics):
            K = np.asarray(K)
            f.write(f"{i + 1} PINHOLE {width} {height} "
                    f"{K[0, 0]} {K[1, 1]} {K[0, 2]} {K[1, 2]}\n")
    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        f.write("# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n")
        for i, c2w in enumerate(c2ws):
            w2c = np.linalg.inv(np.asarray(c2w))
            q = _rotmat_to_qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {i + 1} frame_{i:05d}.png\n\n")
    with open(os.path.join(out_dir, "points3D.txt"), "w") as f:
        f.write("# POINT3D_ID X Y Z R G B ERROR TRACK[]\n")
        if points is not None:
            pts = np.asarray(points)
            cols = (np.clip(np.asarray(colors), 0, 1) * 255).astype(np.uint8)
            if len(pts) > max_points:
                sel = np.random.default_rng(0).choice(len(pts), max_points,
                                                      replace=False)
                pts, cols = pts[sel], cols[sel]
            for i, (p, c) in enumerate(zip(pts, cols)):
                f.write(f"{i + 1} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{c[0]} {c[1]} {c[2]} 0.0\n")
