"""Trajectory synthesis: linear target interpolation and txt-spline mode.

Port of /root/reference/models/utils.py:134-210 (``generate_traj_specified``,
``generate_traj_txt``, ``txt_interpolation``).  Knot interpolation runs on host
(numpy/scipy, it is a handful of floats); pose construction is vectorised JAX.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import UnivariateSpline, interp1d

from trajectorycrafter_tpu.geometry.cameras import sphere2pose


def txt_interpolation(input_list: Sequence[float], n: int, mode: str = "smooth") -> np.ndarray:
    """Resample a knot sequence to n frames (reference models/utils.py:161-171).

    'smooth' fits a cubic smoothing spline (scipy default smoothing factor,
    matching the reference), 'linear' a piecewise-linear interpolant.
    """
    x = np.linspace(0, 1, len(input_list))
    if mode == "smooth":
        f = UnivariateSpline(x, input_list, k=3)
    elif mode == "linear":
        f = interp1d(x, input_list)
    else:
        raise KeyError(f"Invalid txt interpolation mode: {mode}")
    xnew = np.linspace(0, 1, n)
    return f(xnew)


def _knots_to_frames(values: Sequence[float], frame: int) -> np.ndarray:
    """Spline if >3 knots (endpoints pinned) else linear
    (reference models/utils.py:181-200)."""
    values = list(values)
    if len(values) > 3:
        out = txt_interpolation(values, frame, mode="smooth")
        out[0] = values[0]
        out[-1] = values[-1]
    else:
        out = txt_interpolation(values, frame, mode="linear")
    return out


def generate_traj_specified(
    c2w_anchor: jnp.ndarray,
    theta: float,
    phi: float,
    d_r: float,
    d_x: float,
    d_y: float,
    frame: int,
) -> jnp.ndarray:
    """Linear ramp 0 -> target over `frame` poses
    (reference models/utils.py:134-158)."""
    thetas = jnp.linspace(0.0, theta, frame)
    phis = jnp.linspace(0.0, phi, frame)
    rs = jnp.linspace(0.0, d_r, frame)
    xs = jnp.linspace(0.0, d_x, frame)
    ys = jnp.linspace(0.0, d_y, frame)
    return sphere2pose(c2w_anchor, thetas, phis, rs, xs, ys)


def generate_traj_txt(
    c2w_anchor: jnp.ndarray,
    phi: Sequence[float],
    theta: Sequence[float],
    r: Sequence[float],
    frame: int,
) -> jnp.ndarray:
    """Trajectory from theta/phi/r knot lists (reference models/utils.py:174-210).

    Note the reference's argument order (phi, theta, r) is preserved.
    """
    phis = _knots_to_frames(phi, frame)
    thetas = _knots_to_frames(theta, frame)
    rs = _knots_to_frames(r, frame)
    return sphere2pose(
        c2w_anchor,
        jnp.asarray(thetas, jnp.float32),
        jnp.asarray(phis, jnp.float32),
        jnp.asarray(rs, jnp.float32),
    )


def load_traj_txt(path: str) -> tuple:
    """Parse a 3-line trajectory file: theta / phi / r knot rows
    (reference demo.py:570-576)."""
    with open(path, "r") as f:
        lines = f.readlines()
    theta = [float(i) for i in lines[0].split()]
    phi = [float(i) for i in lines[1].split()]
    r = [float(i) for i in lines[2].split()]
    return theta, phi, r
