"""int8 flash attention for head_dim-64 DiT self-attention (Pallas TPU).

Motivation (measured, see docs/COVERAGE.md): the bf16 flash kernel is the
denoise bottleneck -- at head_dim 64 the MXU's 128-lane structure caps the
QK^T and PV matmuls at ~50% utilisation (321 ms of a 487 ms DiT layer at
30k tokens).  v5e doubles int8 MXU throughput, recovering the lost factor:
QK^T and PV run as int8 x int8 -> int32 with per-(batch, head) scales and a
fixed 127 scale on the softmax probabilities (P in [0, 1] after the running-
max subtraction).

Kernel structure (the canonical flash tiling, cf. the matmul/attention
patterns in the TPU kernel guides):
  * grid (batch*heads, q_blocks, kv_blocks); kv is the innermost
    ("arbitrary") reduction dimension;
  * VMEM scratch carries the online-softmax state (running max m, normaliser
    l, fp32 accumulator) across kv blocks; initialised at kv==0, output
    written at the last kv block;
  * kv blocks stream through VMEM double-buffered ((block_k, 64) int8 =
    64 KB -- tiny);
  * zero-padded tail keys are masked with -inf logits via the scalar-prefetch
    valid-length.

Accuracy: ~2e-3 absolute / ~2e-2 relative to fp32 attention -- at the bf16
activation noise floor (tests/test_int8_attention.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(valid_ref, scale_ref, q_ref, k_ref, v_ref, o_ref,
            m_scr, l_scr, acc_scr, *, sm_scale: float):
    """Grid cell (g=batch*head, i=q block, j=kv block).

    q_ref (bq, d) int8; k_ref/v_ref (bk, d) int8; o_ref (bq, d) bf16.
    Scratch: m_scr/l_scr (bq, 128) fp32 (lane-padded), acc_scr (bq, d) fp32.
    """
    g = pl.program_id(0)
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)
    bq, d = q_ref.shape
    bk = k_ref.shape[0]

    valid = valid_ref[g, 0]
    qs = scale_ref[g, 0]
    ks = scale_ref[g, 1]
    vs = scale_ref[g, 2]
    logit_scale = qs * ks * sm_scale

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s_i32 = jax.lax.dot_general(
        q_ref[:], k_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, bk)
    s = s_i32.astype(jnp.float32) * logit_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + j * bk
    s = jnp.where(col < valid, s, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk) in [0, 1]
    p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
    pv_i32 = jax.lax.dot_general(
        p_i8, v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bq, d)
    pv = pv_i32.astype(jnp.float32) * (vs / 127.0)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(
        l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
    )
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(j == n_kv - 1)
    def _out():
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-20)).astype(o_ref.dtype)


def _quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, head) symmetric int8 quantisation of (B, H, S, D)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / scale[..., None, None])
    return jnp.clip(xq, -127, 127).astype(jnp.int8), scale


def _pad_seq(x, block):
    s = x.shape[2]
    pad = (-s) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, s


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "interpret"))
def int8_flash_attention(
    q: jnp.ndarray,  # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, s, d = q.shape
    if sm_scale is None:
        sm_scale = d**-0.5
    block_q = min(block_q, max(128, 1 << (s - 1).bit_length()))
    block_k = min(block_k, block_q)

    qq, qs = _quantize(q)
    kq, ks = _quantize(k)
    vq, vs = _quantize(v)
    pad_block = max(block_q, block_k)
    qq, s_orig = _pad_seq(qq, pad_block)
    kq, _ = _pad_seq(kq, pad_block)
    vq, _ = _pad_seq(vq, pad_block)
    sp = qq.shape[2]

    assert sp % block_q == 0 and sp % block_k == 0, (
        f"padded seq {sp} must be divisible by block_q={block_q} and "
        f"block_k={block_k}; a floor-divided kv grid would silently drop keys")
    bh = b * h
    qq = qq.reshape(bh, sp, d)
    kq = kq.reshape(bh, sp, d)
    vq = vq.reshape(bh, sp, d)
    scales = jnp.stack(
        [qs.reshape(bh), ks.reshape(bh), vs.reshape(bh)], axis=-1
    ).astype(jnp.float32)  # (bh, 3)
    valid = jnp.full((bh, 1), s_orig, jnp.int32)

    grid = (bh, sp // block_q, sp // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # valid, scales
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j, *_: (g, i, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j, *_: (g, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j, *_: (g, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, d), lambda g, i, j, *_: (g, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),  # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(valid, scales, qq, kq, vq)
    return out.reshape(b, h, sp, d)[:, :, :s_orig]
