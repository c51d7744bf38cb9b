"""Real-TPU assertions for the Pallas int8 GEMM (pytest -m tpu).

The default suite validates ops/pallas/int8_matmul.py in interpret mode
(tests/test_int8_dense.py); these tests compile the kernel through Mosaic
on the chip and pin it to the XLA int8 dot at production-like shapes.
Run via tests/run_tpu_tests.sh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform == "cpu",
        reason="needs the real TPU (run via tests/run_tpu_tests.sh)",
    ),
]


@pytest.mark.parametrize("m,k,n", [(1024, 3072, 3072), (777, 3072, 12288),
                                   (512, 12288, 3072), (512, 2048, 4096)])
def test_pallas_int8_gemm_matches_xla_on_chip(m, k, n):
    from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
        int8_dense_apply, quantize_rows)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.02
    ws = jnp.maximum(jnp.abs(w).max(0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    bias = jax.random.normal(k3, (n,), jnp.float32)

    got = np.asarray(int8_dense_apply(x, wq, ws, bias=bias,
                                      out_dtype=jnp.float32))
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    want = np.asarray(acc.astype(jnp.float32) * xs[:, None] * ws[None, :]
                      + bias)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-5)


def test_int8_dense_auto_uses_pallas_on_chip():
    """impl="auto" on an unmeshed TPU routes through the Pallas kernel and
    matches the XLA path numerically."""
    from trajectorycrafter_tpu.ops.int8 import Int8Dense, quantize_dense_params
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(0), (600, 256), jnp.float32)
    p = nn.Dense(256).init(jax.random.PRNGKey(1), x)["params"]
    qp = quantize_dense_params(p)
    auto = np.asarray(Int8Dense(256).apply({"params": qp}, x))
    xla = np.asarray(Int8Dense(256, impl="xla").apply({"params": qp}, x))
    np.testing.assert_allclose(auto, xla, atol=1e-2, rtol=1e-4)


def test_fused_int8_ff_matches_unfused_on_chip():
    """int8_ff_apply (gelu+group-requant epilogue -> group-dequant GEMM)
    compiles through Mosaic and tracks the per-layer Int8Dense chain."""
    from trajectorycrafter_tpu.ops.int8 import int8_dense_forward
    from trajectorycrafter_tpu.ops.pallas.int8_matmul import int8_ff_apply

    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m, k, inner, n = 1024, 3072, 12288, 3072
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w1 = jax.random.normal(k2, (k, inner), jnp.float32) * 0.02
    b1 = jax.random.normal(k3, (inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(k4, (inner, n), jnp.float32) * 0.02
    b2 = jax.random.normal(k5, (n,), jnp.float32) * 0.1

    def qcols(w):
        ws = jnp.maximum(jnp.abs(w).max(0), 1e-12) / 127.0
        return jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8), ws

    wq1, ws1 = qcols(w1)
    wq2, ws2 = qcols(w2)
    fused = np.asarray(int8_ff_apply(x, wq1, ws1, b1, wq2, ws2, b2,
                                     out_dtype=jnp.float32))
    h = int8_dense_forward(x, wq1, ws1, bias=b1, dtype=jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    unfused = np.asarray(int8_dense_forward(h, wq2, ws2, bias=b2,
                                            dtype=jnp.float32))
    denom = max(np.abs(unfused).max(), 1e-6)
    assert np.abs(fused - unfused).max() / denom < 0.02
    cos = (fused * unfused).sum() / (
        np.linalg.norm(fused) * np.linalg.norm(unfused))
    assert cos > 0.9995
