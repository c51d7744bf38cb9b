"""Fused int8 FF chain (GEMM1 + in-epilogue gelu/group-requant -> GEMM2
with per-K-group dequant accumulate), ops/pallas/int8_matmul.py.

Interpret-mode (CPU) checks; the on-chip Mosaic compilation of the same
kernels is asserted by tests/test_int8_matmul_tpu.py via run_tpu_tests.sh.
Reference math: crosstransformer3d.py:140 block feed_forward (diffusers
FeedForward, gelu-approximate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
    int8_ff_apply,
    int8_matmul_gelu_quant,
    int8_matmul_gscale,
    quantize_rows,
)


def _quant_cols(w):
    ws = jnp.maximum(jnp.abs(w).max(0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    return wq, ws


def _gelu_tanh_np(x):
    c = 0.7978845608028654
    return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x ** 3)))


@pytest.fixture
def ff_problem():
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m, k, inner, n = 96, 256, 512, 256
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w1 = jax.random.normal(k2, (k, inner), jnp.float32) * 0.05
    b1 = jax.random.normal(k3, (inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(k4, (inner, n), jnp.float32) * 0.05
    b2 = jax.random.normal(k5, (n,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


def test_gelu_quant_kernel_matches_reference(ff_problem):
    x, w1, b1, _, _ = ff_problem
    xq, xs = quantize_rows(x)
    wq1, ws1 = _quant_cols(w1)
    group = 256
    yq, ys = int8_matmul_gelu_quant(
        xq, wq1, xs, ws1, bias=b1, block_m=32, block_n=group, block_k=128,
        interpret=True)
    assert yq.dtype == jnp.int8
    n_groups = w1.shape[1] // group
    assert ys.shape == (x.shape[0], n_groups * 128)

    # reference: int8 GEMM -> dequant -> +bias -> gelu -> per-group quant
    acc = np.asarray(xq, np.int32) @ np.asarray(wq1, np.int32)
    y = acc * np.asarray(xs)[:, None] * np.asarray(ws1)[None, :] + np.asarray(b1)
    y = _gelu_tanh_np(y)
    got = np.asarray(yq, np.float32).reshape(y.shape[0], n_groups, group)
    scales = np.asarray(ys, np.float32).reshape(y.shape[0], n_groups, 128)[..., 0]
    deq = (got * scales[:, :, None]).reshape(y.shape)
    np.testing.assert_allclose(deq, y, atol=np.abs(y).max() / 120, rtol=0)
    # scales really are the per-(row, group) absmax / 127
    want_s = np.maximum(
        np.abs(y).reshape(y.shape[0], n_groups, group).max(-1), 1e-8) / 127.0
    np.testing.assert_allclose(scales, want_s, rtol=1e-6)


def test_gscale_kernel_matches_reference(ff_problem):
    x, _, _, w2, b2 = ff_problem
    m = x.shape[0]
    inner = w2.shape[0]
    group = 128
    n_groups = inner // group
    key = jax.random.PRNGKey(3)
    hq = jax.random.randint(key, (m, inner), -127, 128, jnp.int32).astype(jnp.int8)
    hs = jax.random.uniform(jax.random.PRNGKey(4), (m, n_groups),
                            jnp.float32, 0.001, 0.02)
    hs_lane = jnp.repeat(hs, 128, axis=1)
    wq2, ws2 = _quant_cols(w2)

    out = int8_matmul_gscale(hq, wq2, hs_lane, ws2, bias=b2, block_m=32,
                             block_n=256, block_k=group,
                             out_dtype=jnp.float32, interpret=True)

    accs = np.asarray(hq, np.int32).reshape(m, n_groups, group)
    want = np.zeros((m, w2.shape[1]), np.float64)
    for g in range(n_groups):
        part = accs[:, g, :].astype(np.int64) @ np.asarray(
            wq2, np.int64)[g * group:(g + 1) * group]
        want += part * np.asarray(hs)[:, g:g + 1]
    want = want * np.asarray(ws2)[None, :] + np.asarray(b2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5,
                               atol=np.abs(want).max() * 1e-5)


def test_fused_ff_matches_unfused_int8(ff_problem):
    """The fused chain tracks the per-layer Int8Dense composition (which the
    CPU/meshed paths run) within group-vs-row quantization error."""
    x, w1, b1, w2, b2 = ff_problem
    wq1, ws1 = _quant_cols(w1)
    wq2, ws2 = _quant_cols(w2)

    fused = int8_ff_apply(x, wq1, ws1, b1, wq2, ws2, b2,
                          out_dtype=jnp.float32, group=256, interpret=True)

    from trajectorycrafter_tpu.ops.int8 import int8_dense_forward
    h = int8_dense_forward(x, wq1, ws1, bias=b1, dtype=jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    unfused = int8_dense_forward(h, wq2, ws2, bias=b2, dtype=jnp.float32)

    f, u = np.asarray(fused), np.asarray(unfused)
    denom = max(np.abs(u).max(), 1e-6)
    assert np.abs(f - u).max() / denom < 0.02
    cos = (f * u).sum() / (np.linalg.norm(f) * np.linalg.norm(u))
    assert cos > 0.9995

    # exact fp32 reference: stays within the int8 error envelope
    exact = _gelu_tanh_np(np.asarray(x) @ np.asarray(w1) + np.asarray(b1)) \
        @ np.asarray(w2) + np.asarray(b2)
    assert np.abs(f - exact).max() / max(np.abs(exact).max(), 1e-6) < 0.05


def test_fused_ff_padding_path(ff_problem):
    """M not a multiple of the row block: padded rows must not leak."""
    x, w1, b1, w2, b2 = ff_problem
    wq1, ws1 = _quant_cols(w1)
    wq2, ws2 = _quant_cols(w2)
    x_odd = x[:70]  # 70 % 32 != 0
    full = int8_ff_apply(x, wq1, ws1, b1, wq2, ws2, b2,
                         out_dtype=jnp.float32, group=256, interpret=True)
    odd = int8_ff_apply(x_odd, wq1, ws1, b1, wq2, ws2, b2,
                        out_dtype=jnp.float32, group=256, interpret=True)
    assert odd.shape == (70, w2.shape[1])
    np.testing.assert_allclose(np.asarray(odd), np.asarray(full)[:70],
                               rtol=1e-6, atol=1e-6)


def test_feedforward_module_fused_flag(ff_problem):
    """FeedForward(quant="int8") declares the Int8Dense param tree and the
    fuse=False path reproduces the per-layer composition exactly."""
    from trajectorycrafter_tpu.models.dit import FeedForward
    from trajectorycrafter_tpu.ops.int8 import quantize_dense_params

    x, w1, b1, w2, b2 = ff_problem
    params = {
        "proj_in": quantize_dense_params({"kernel": w1, "bias": b1}),
        "proj_out": quantize_dense_params({"kernel": w2, "bias": b2}),
    }
    ff = FeedForward(dim=w2.shape[1], mult=w1.shape[1] // w2.shape[1],
                     quant="int8", fuse=False, dtype=jnp.float32)
    # mult chosen so dim * mult == w1 out features
    assert ff.dim * ff.mult == w1.shape[1]
    got = ff.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)

    from trajectorycrafter_tpu.ops.int8 import int8_dense_forward
    h = int8_dense_forward(x, jnp.asarray(params["proj_in"]["kernel_q"]),
                           jnp.asarray(params["proj_in"]["scale"]),
                           bias=jnp.asarray(params["proj_in"]["bias"]),
                           dtype=jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    want = int8_dense_forward(h, jnp.asarray(params["proj_out"]["kernel_q"]),
                              jnp.asarray(params["proj_out"]["scale"]),
                              bias=jnp.asarray(params["proj_out"]["bias"]),
                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)

    # param tree matches what quantize_dit_params produces for Int8Dense
    init_tree = jax.eval_shape(
        lambda: ff.init(jax.random.PRNGKey(0), x))["params"]
    assert set(init_tree) == {"proj_in", "proj_out"}
    assert set(init_tree["proj_in"]) == {"kernel_q", "scale", "bias"}
    assert init_tree["proj_in"]["kernel_q"].shape == w1.shape
    assert init_tree["proj_in"]["kernel_q"].dtype == jnp.int8
