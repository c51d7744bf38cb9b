"""int8 x int8 -> int32 GEMM with fused dequant epilogue (Pallas TPU).

The XLA lowering of the Int8Dense GEMM (ops/int8.py) reaches only ~1.39x
the bf16 rate on v5e (nominal int8 MXU rate: 2x; docs/COVERAGE.md round-3
notes), so this kernel drives the int8 MXU directly: classic blocked
matmul, grid (M/bm, N/bn, K/bk) with the K dimension as the "arbitrary"
reduction, int32 VMEM accumulator, and the per-token activation scale x
per-output-channel weight scale dequant fused into the final-K epilogue so
the int32 accumulator never round-trips HBM.

Replaces the reference's precision strategy (straight bf16 autocast on
cuBLAS, SURVEY.md section 1) for the DiT's MXU-bound projections behind
``quant="int8"``; see crosstransformer3d.py:711-871 for the reference
modules these GEMMs come from.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fit_block(want: int, dim: int) -> int:
    """Largest power-of-two-ish block <= want that divides dim (the DiT's
    GEMM dims are all multiples of 1024 or 2048; perceiver K/N include
    2048/4096)."""
    if dim % want == 0:
        return want
    b = min(want, dim)
    while b > 128 and dim % b:
        b //= 2
    return b if dim % b == 0 else dim


def _kernel(xq_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_scr):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _out():
        # xs: (bm, 128) with the real per-row scale broadcast along lanes;
        # ws/b: (1, bn) per-output-channel weight scale and bias
        o_ref[:] = (acc_scr[:].astype(jnp.float32)
                    * xs_ref[:, :1] * ws_ref[:] + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def int8_matmul(
    xq: jnp.ndarray,      # (M, K) int8
    w: jnp.ndarray,       # (K, N) int8
    xs: jnp.ndarray,      # (M,) or lane-broadcast (M, 128) f32 act scale
    ws: jnp.ndarray,      # (N,) float32 per-column weight scale
    bias: jnp.ndarray = None,  # optional (N,) bias, fused into the epilogue
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1536,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """-> (M, N) out_dtype = (xq @ w) * xs[:, None] * ws[None, :] + bias.

    M, K, N must be multiples of the block sizes (the Int8Dense wrapper
    pads M; K/N are production-shape multiples of 1536/1024 already).
    """
    m, kdim = xq.shape
    n = w.shape[1]
    block_m = min(block_m, m)
    block_n = _fit_block(block_n, n)
    block_k = _fit_block(block_k, kdim)
    assert m % block_m == 0 and n % block_n == 0 and kdim % block_k == 0, (
        (m, kdim, n), (block_m, block_k, block_n))

    # per-row scales as a (M, 128) lane-broadcast block so the epilogue can
    # read them as a normal VMEM tile (f32 min tile sublane 8 x lane 128)
    xs2 = (xs if xs.ndim == 2 else
           jnp.broadcast_to(xs.astype(jnp.float32)[:, None], (m, 128)))
    ws2 = ws.astype(jnp.float32)[None, :]
    b2 = (jnp.zeros((1, n), jnp.float32) if bias is None
          else bias.astype(jnp.float32)[None, :])

    grid = (m // block_m, n // block_n, kdim // block_k)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((block_m, 128), lambda i, j, k: (i, 0)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, w, xs2, ws2, b2)


def _gelu_tanh(x):
    """diffusers 'gelu-approximate' (tanh), computed in f32 in-kernel."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _kernel_gelu_quant(xq_ref, w_ref, xs_ref, ws_ref, b_ref, yq_ref, ys_ref,
                       acc_scr):
    """int8 GEMM whose epilogue applies bias+tanh-gelu and re-quantizes the
    activation tile to int8 with a per-(row, N-tile) group scale -- the FF
    intermediate never round-trips HBM in bf16."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _out():
        y = (acc_scr[:].astype(jnp.float32)
             * xs_ref[:, :1] * ws_ref[:] + b_ref[:])
        y = _gelu_tanh(y)
        s = jnp.maximum(jnp.max(jnp.abs(y), axis=1, keepdims=True), 1e-8) / 127.0
        yq_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
        ys_ref[:] = jnp.broadcast_to(s, ys_ref.shape)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def int8_matmul_gelu_quant(
    xq: jnp.ndarray,      # (M, K) int8
    w: jnp.ndarray,       # (K, N) int8
    xs: jnp.ndarray,      # (M,) or (M, 128) f32 act scale
    ws: jnp.ndarray,      # (N,) f32 per-column weight scale
    bias: jnp.ndarray = None,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1536,
    interpret: bool = False,
):
    """-> ((M, N) int8, (M, (N/block_n)*128) f32 lane-broadcast group scales)
    = group-quantized gelu((xq @ w) * xs * ws + bias).  The quantization
    group equals ``block_n``; feed the result to :func:`int8_matmul_gscale`
    with ``block_k == block_n``."""
    m, kdim = xq.shape
    n = w.shape[1]
    block_m = min(block_m, m)
    block_n = _fit_block(block_n, n)
    block_k = _fit_block(block_k, kdim)
    assert m % block_m == 0 and n % block_n == 0 and kdim % block_k == 0, (
        (m, kdim, n), (block_m, block_k, block_n))
    n_groups = n // block_n

    xs2 = (xs if xs.ndim == 2 else
           jnp.broadcast_to(xs.astype(jnp.float32)[:, None], (m, 128)))
    ws2 = ws.astype(jnp.float32)[None, :]
    b2 = (jnp.zeros((1, n), jnp.float32) if bias is None
          else bias.astype(jnp.float32)[None, :])

    grid = (m // block_m, n_groups, kdim // block_k)
    return pl.pallas_call(
        _kernel_gelu_quant,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((block_m, 128), lambda i, j, k: (i, 0)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
                pl.BlockSpec((block_m, 128), lambda i, j, k: (i, j)),
            ],
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.int8),
            jax.ShapeDtypeStruct((m, n_groups * 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, w, xs2, ws2, b2)


def _kernel_gscale(xq_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_scr):
    """int8 GEMM with per-(row, K-group) activation scales: each K-block's
    int32 partial product is dequantized into an f32 accumulator (the
    consumer of :func:`int8_matmul_gelu_quant`'s group-quantized output)."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    part = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_scr[:] += part.astype(jnp.float32) * xs_ref[:, :1]

    @pl.when(k == n_k - 1)
    def _out():
        o_ref[:] = (acc_scr[:] * ws_ref[:] + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "out_dtype", "interpret"))
def int8_matmul_gscale(
    xq: jnp.ndarray,      # (M, K) int8, group-quantized along K
    w: jnp.ndarray,       # (K, N) int8
    xs: jnp.ndarray,      # (M, (K/block_k)*128) f32 lane-broadcast group scales
    ws: jnp.ndarray,      # (N,) f32
    bias: jnp.ndarray = None,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """-> (M, N) out_dtype with per-K-group activation dequantization.
    ``block_k`` must equal the producer's quantization group."""
    m, kdim = xq.shape
    n = w.shape[1]
    block_m = min(block_m, m)
    block_n = _fit_block(block_n, n)
    assert m % block_m == 0 and n % block_n == 0 and kdim % block_k == 0, (
        (m, kdim, n), (block_m, block_k, block_n))
    assert xs.shape == (m, (kdim // block_k) * 128), (xs.shape, m, kdim, block_k)

    ws2 = ws.astype(jnp.float32)[None, :]
    b2 = (jnp.zeros((1, n), jnp.float32) if bias is None
          else bias.astype(jnp.float32)[None, :])

    grid = (m // block_m, n // block_n, kdim // block_k)
    return pl.pallas_call(
        _kernel_gscale,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((block_m, 128), lambda i, j, k: (i, k)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, w, xs, ws2, b2)


def int8_ff_apply(x, kernel_q1, scale1, bias1, kernel_q2, scale2, bias2,
                  out_dtype=jnp.bfloat16, group: int = 1024,
                  interpret: bool = False):
    """Fused int8 FF chain: x -> GEMM1(+bias+gelu+group-requant, in-epilogue)
    -> GEMM2(group-dequant accumulate).  The (M, 4*dim) intermediate stays
    int8 end to end: vs the unfused path (GEMM1 bf16 out -> XLA gelu ->
    row-requant -> GEMM2) it saves the bf16 write+read and the extra quant
    pass over the widest activation in the network (~6 GB HBM traffic per
    42-block step at the production shape).

    Replaces the reference FF (crosstransformer3d.py:140 block feed_forward,
    diffusers FeedForward gelu-approximate) under ``quant="int8"`` on an
    unmeshed TPU.
    """
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    n_out = kernel_q2.shape[1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, kdim)
    block_m = 512 if m >= 512 else 32
    pad = (-m) % block_m
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)), constant_values=1.0)
    qblock = _quant_block_m(x2.shape[0], kdim)
    if qblock is not None:
        xq, xs = quantize_rows_pallas(x2, block_m=qblock, interpret=interpret)
    else:
        xq, xs = quantize_rows(x2)
    group = _fit_block(group, kernel_q1.shape[1])
    hq, hs = int8_matmul_gelu_quant(
        xq, kernel_q1, xs, scale1, bias=bias1, block_m=block_m,
        block_n=group, interpret=interpret)
    out = int8_matmul_gscale(
        hq, kernel_q2, hs, scale2, bias=bias2, block_m=block_m,
        block_k=group, out_dtype=out_dtype, interpret=interpret)
    if pad:
        out = out[:m]
    return out.reshape(*lead, n_out)


def _quant_block_m(m: int, kdim: int):
    """Largest row block for :func:`quantize_rows_pallas` that (a) divides
    ``m`` and (b) keeps the kernel inside the 16 MB scoped-VMEM limit.

    In-flight VMEM per row is ~14*K bytes (f32 input x2 buffers, the f32
    stack temp, int8 output x2, scales); budget 11 MB leaves headroom for
    Mosaic's own scratch.  Returns None when no block >= 8 fits (fall back
    to the XLA lowering).
    """
    budget = 11 * 1024 * 1024
    cap = max(budget // (14 * kdim), 0)
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if bm <= cap and m % bm == 0:
            return bm
    return None


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8: (M, K) float -> ((M, K) int8, (M,) f32)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs[:, None]), -127, 127).astype(jnp.int8)
    return xq, xs


def _quant_kernel(x_ref, xq_ref, xs_ref):
    xf = x_ref[:].astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8) / 127.0
    xq_ref[:] = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    xs_ref[:] = jnp.broadcast_to(xs, xs_ref.shape)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def quantize_rows_pallas(x: jnp.ndarray, block_m: int = 512,
                         interpret: bool = False):
    """Single-HBM-pass row quantization: each (block_m, K) tile is read
    once, row-maxed and quantized in VMEM (the XLA lowering splits the
    reduce and the elementwise quant into two passes over x).

    -> ((M, K) int8, (M, 128) f32 lane-broadcast scales), M % block_m == 0.
    The scale layout matches what :func:`int8_matmul` consumes directly.
    """
    m, kdim = x.shape
    block_m = min(block_m, m)
    assert m % block_m == 0, (m, block_m)
    xq, xs = pl.pallas_call(
        _quant_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(m // block_m,),
            in_specs=[pl.BlockSpec((block_m, kdim), lambda i: (i, 0))],
            out_specs=[
                pl.BlockSpec((block_m, kdim), lambda i: (i, 0)),
                pl.BlockSpec((block_m, 128), lambda i: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m, kdim), jnp.int8),
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x)
    return xq, xs


def int8_dense_apply(x, kernel_q, scale, bias=None, out_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Int8Dense forward through the Pallas GEMM.

    x: (..., K) float; kernel_q: (K, N) int8; scale: (N,) f32.  Leading
    dims are flattened into M and padded to the 512-row block.
    """
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    n = kernel_q.shape[1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, kdim)
    block_m = 512 if m >= 512 else 32
    pad = (-m) % block_m
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)), constant_values=1.0)
    # single-pass Pallas row quantization (block bounded by scoped VMEM)
    qblock = _quant_block_m(x2.shape[0], kdim)
    if qblock is not None:
        xq, xs = quantize_rows_pallas(x2, block_m=qblock, interpret=interpret)
    else:
        xq, xs = quantize_rows(x2)
    out = int8_matmul(xq, kernel_q, xs, scale, bias=bias, block_m=block_m,
                      out_dtype=out_dtype, interpret=interpret)
    if pad:
        out = out[:m]
    return out.reshape(*lead, n)
