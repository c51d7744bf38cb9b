"""Golden tests for the forward-splat warp.

The golden model is an independent, loop-based numpy implementation of the
published splatting algorithm (soft z-buffered bilinear forward splat), so the
JAX scatter kernel is validated against straightforward scalar code.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.ops.splat import (
    bilinear_splat,
    forward_warp_batch,
    forward_warp_single,
    transform_points,
)


def golden_splat(values, mask, depth, flow, is_image):
    """Scalar-loop reference: splat each source pixel into 4 corners."""
    h, w, c = values.shape
    acc = np.zeros((h + 2, w + 2, c), np.float64)
    wacc = np.zeros((h + 2, w + 2), np.float64)

    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    px = flow[..., 0] + gx + 1.0
    py = flow[..., 1] + gy + 1.0

    sat = np.clip(depth, 0, 1000.0)
    logd = np.log1p(sat)
    dw = np.exp(logd / logd.max() * 50.0)

    for y in range(h):
        for x in range(w):
            fx, fy = np.floor(px[y, x]), np.floor(py[y, x])
            cx, cy = np.ceil(px[y, x]), np.ceil(py[y, x])
            ppx = np.clip(px[y, x], 0, w + 1)
            ppy = np.clip(py[y, x], 0, h + 1)
            fx, cx = np.clip(fx, 0, w + 1), np.clip(cx, 0, w + 1)
            fy, cy = np.clip(fy, 0, h + 1), np.clip(cy, 0, h + 1)
            base = mask[y, x] / dw[y, x]
            for (iy, ix, pw) in (
                (fy, fx, (1 - (ppy - fy)) * (1 - (ppx - fx))),
                (cy, fx, (1 - (cy - ppy)) * (1 - (ppx - fx))),
                (fy, cx, (1 - (ppy - fy)) * (1 - (cx - ppx))),
                (cy, cx, (1 - (cy - ppy)) * (1 - (cx - ppx))),
            ):
                wgt = pw * base
                acc[int(iy), int(ix)] += values[y, x] * wgt
                wacc[int(iy), int(ix)] += wgt

    acc = acc[1:-1, 1:-1]
    wacc = wacc[1:-1, 1:-1]
    known = wacc > 0
    fill = -1.0 if is_image else 0.0
    out = np.where(known[..., None], acc / np.where(known, wacc, 1)[..., None], fill)
    if is_image:
        out = np.clip(out, -1, 1)
    return out.astype(np.float32), known.astype(np.float32)


@pytest.mark.parametrize("is_image", [True, False])
@pytest.mark.slow
def test_bilinear_splat_matches_golden(rng, is_image):
    h, w, c = 13, 17, 3
    values = rng.uniform(-1, 1, (h, w, c)).astype(np.float32)
    mask = (rng.uniform(size=(h, w)) > 0.2).astype(np.float32)
    depth = rng.uniform(0.5, 8.0, (h, w)).astype(np.float32)
    flow = rng.uniform(-3, 3, (h, w, 2)).astype(np.float32)

    got_v, got_m = bilinear_splat(
        jnp.asarray(values), jnp.asarray(mask), jnp.asarray(depth),
        jnp.asarray(flow), None, is_image=is_image,
    )
    want_v, want_m = golden_splat(values, mask, depth, flow, is_image)
    np.testing.assert_allclose(np.asarray(got_m), want_m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "case",
    ["integer", "half_integer", "far_oob", "border_exact", "mixed_axis"],
)
@pytest.mark.slow
def test_bilinear_splat_degenerate_landings(rng, case):
    """Edge cases of the fused one-row-per-pixel scatter (ops/splat.py:98-113).

    The fold puts the ceil-corner weight into the floor slot whenever
    ceil==floor after clipping -- exercised by exact-integer landing
    positions, landings clipped to the same border cell from far outside,
    and landings exactly on the padded-grid border.  Each must bit-match
    the scalar 4-corner golden loop.
    """
    h, w, c = 9, 11, 3
    values = rng.uniform(-1, 1, (h, w, c)).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    depth = rng.uniform(0.5, 8.0, (h, w)).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))

    if case == "integer":
        # every landing is an exact integer cell: deg_x and deg_y everywhere
        tx = rng.integers(-2, w + 2, (h, w)).astype(np.float32)
        ty = rng.integers(-2, h + 2, (h, w)).astype(np.float32)
    elif case == "half_integer":
        # one axis integer, the other exactly between cells
        tx = rng.integers(0, w, (h, w)).astype(np.float32)
        ty = rng.integers(0, h - 1, (h, w)) + 0.5
    elif case == "far_oob":
        # far outside: pos clips to the same border cell on both corners
        tx = np.where(gx < w // 2, -50.0, w + 50.0).astype(np.float32)
        ty = np.where(gy < h // 2, -50.0, h + 50.0).astype(np.float32)
    elif case == "border_exact":
        # exactly on the clip boundaries of the padded grid (-1 and w/h + 1,
        # i.e. padded coords 0 and w+2 pre-clip)
        tx = np.where(gx % 2 == 0, -1.0, float(w + 1)).astype(np.float32)
        ty = np.where(gy % 2 == 0, -1.0, float(h + 1)).astype(np.float32)
    else:  # mixed_axis: degenerate in x only / y only on alternating pixels
        tx = np.where(gx % 2 == 0, gx, gx + 0.25).astype(np.float32)
        ty = np.where(gy % 2 == 1, gy, gy + 0.75).astype(np.float32)

    flow = np.stack([tx - gx, ty - gy], axis=-1).astype(np.float32)
    got_v, got_m = bilinear_splat(
        jnp.asarray(values), jnp.asarray(mask), jnp.asarray(depth),
        jnp.asarray(flow), None, is_image=False,
    )
    want_v, want_m = golden_splat(values, mask, depth, flow, False)
    np.testing.assert_allclose(np.asarray(got_m), want_m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=2e-4, atol=2e-4)


def test_transform_points_identity(rng):
    """Identity transform must reproject every pixel onto itself."""
    h, w = 6, 8
    depth = rng.uniform(1, 5, (h, w)).astype(np.float32)
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    pts = np.asarray(transform_points(jnp.asarray(depth), T, T, K))
    xy = pts[..., :2] / pts[..., 2:3]
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(xy[..., 0], gx, atol=1e-4)
    np.testing.assert_allclose(xy[..., 1], gy, atol=1e-4)
    np.testing.assert_allclose(pts[..., 2], depth, rtol=1e-5)


def test_transform_points_behind_camera_culled():
    h, w = 4, 4
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[10.0, 0, 2], [0, 10.0, 2], [0, 0, 1]], np.float32)
    T1 = np.eye(4, dtype=np.float32)
    # translate target camera far along +z so points fall behind it
    T2 = np.eye(4, dtype=np.float32)
    T2[2, 3] = -10.0
    pts = np.asarray(transform_points(jnp.asarray(depth), T1, T2, K))
    assert np.all(pts == 1000.0)


@pytest.mark.slow
def test_identity_warp_roundtrip(rng):
    """Warping with identical source/target poses must return the input.

    Depth is uniform: with varying depth, float dirt (~1e-7) in the
    reprojected flow lets the soft z-buffer weights (exp(50*...)) leak
    across neighbouring pixels -- exactly as in the reference implementation.
    """
    h, w = 12, 16
    frame = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    warped, mask, wdepth, flow = forward_warp_single(
        jnp.asarray(frame), None, jnp.asarray(depth), T, T, K, K
    )
    np.testing.assert_allclose(np.asarray(warped), frame, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mask), 1.0)
    np.testing.assert_allclose(np.asarray(wdepth), depth, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def test_forward_warp_batch_shapes(rng):
    n, h, w = 3, 10, 14
    frames = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    depths = rng.uniform(1, 4, (n, h, w)).astype(np.float32)
    K = np.tile(np.array([[40.0, 0, 7], [0, 40.0, 5], [0, 0, 1]], np.float32), (n, 1, 1))
    T1 = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T2 = T1.copy()
    T2[:, 0, 3] = 0.02  # small lateral shift
    warped, masks, wdepth, flow = forward_warp_batch(
        jnp.asarray(frames), jnp.asarray(depths), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(K),
    )
    assert warped.shape == (n, h, w, 3)
    assert masks.shape == (n, h, w)
    assert wdepth.shape == (n, h, w)
    assert flow.shape == (n, h, w, 2)
    # most pixels remain known under a tiny shift
    assert np.asarray(masks).mean() > 0.9
