"""Two-pass exp2 flash attention: exact for UNBOUNDED (non-QK-normed) scores.

The production DiT kernel (flash_exp2.py) replaces the online running max
with a fixed bias, which is only exact when the score range is bounded --
true for the DiT's QK-layernormed attention, NOT for the DepthCrafter SVD
UNet (reference models/infer.py:52-92 runs it through xformers; the UNet has
no QK-norm, docs/COVERAGE.md).  Round-4 therefore left the depth stage on
the stock running-max kernel -- the slowest of the family -- making depth
the largest non-denoise cost (9.7 s of the 29.5 s tail).

This kernel keeps the exp2 restructuring but gets an exact per-row bias from
a FIRST pass that computes only the true row max of the scaled scores:

  pass 1 (max):  m[row] = max_kv (q*scale*log2e) . k^T      -- MXU + row-max
  pass 2 (attn): the transposed exp2 kernel with bias = m[row]

Per score element the VPU does: pass1 max-update; pass2 subtract + exp2 +
cast (+ row-sum on an (8, bq) lane).  The stock kernel's per-element work is
larger (sub-max, exp, running max/sum update, accumulator rescale), and its
PV matmul writes only d of 128 MXU output lanes, while pass 2 here runs both
matmuls at full width (the transposed layout contracts over the kv axis).
The price is computing QK^T twice -- MXU time, which sits in the VPU shadow
at these shapes.

Exactness: softmax is invariant to any per-row constant; with the TRUE row
max, exp2 arguments are <= 0 (no overflow) and underflow behaviour equals
the standard safe softmax.  Padded kv rows are masked to -1e30 in BOTH
passes (static tail masking -- free when Skv divides the block, as at the
production depth shape 9216 = 9 x 1024), so no analytic pad correction is
needed and the all-scores-negative case is exact (the ring-attention
ADVICE r4 cancellation window does not arise).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKED = -1e30  # finite -inf stand-in: avoids inf-inf NaN edges


def _max_kernel(q_ref, k_ref, o_ref, q_scr, m_scr, *, scale: float,
                skv_real: int, block_k: int, kv_pad: int):
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _MASKED)
        q_scr[:] = (q_ref[:].astype(jnp.float32) * scale).astype(q_scr.dtype)

    # s_t (bk, bq) = k . (q*scale)^T -- fp32 on the MXU
    s_t = jax.lax.dot_general(
        k_ref[:], q_scr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kv_pad:  # static: only compiled in when the kv length doesn't divide
        kvi = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        s_t = jnp.where(kvi < skv_real, s_t, _MASKED)
    m_scr[:1, :] = jnp.maximum(m_scr[:1, :],
                               jnp.max(s_t, axis=0, keepdims=True))

    @pl.when(j == n_kv - 1)
    def _out():
        o_ref[:] = m_scr[:1, :]


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, q_scr, acc_scr, den_scr,
                 *, scale: float, skv_real: int, block_k: int, kv_pad: int):
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        den_scr[:] = jnp.zeros_like(den_scr)
        q_scr[:] = (q_ref[:].astype(jnp.float32) * scale).astype(q_scr.dtype)

    s_t = jax.lax.dot_general(
        k_ref[:], q_scr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s_t = s_t - m_ref[:1, :]  # per-row true max: arguments <= 0
    if kv_pad:
        kvi = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        s_t = jnp.where(kvi < skv_real, s_t, _MASKED)
    p_t = jnp.exp2(s_t).astype(v_ref.dtype)
    # numerator (d, bq) += v^T . p_t -- full MXU width (contraction over kv)
    acc_scr[:] += jax.lax.dot_general(
        v_ref[:], p_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    den_scr[:] += jnp.sum(p_t.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(j == n_kv - 1)
    def _out():
        denom = jnp.maximum(den_scr[:1, :], 1e-30)
        o_ref[:] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_pad", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention_maxpass(
    q: jnp.ndarray,  # (B, H, Sq, D)
    k: jnp.ndarray,  # (B, H, Skv, D) -- last kv_pad rows are padding
    v: jnp.ndarray,
    kv_pad: int = 0,
    sm_scale: float | None = None,
    block_q: int = 2048,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact full attention for unbounded scores -> (B, H, D, Sq)
    (transposed output, same contract as flash_attention_exp2_t)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)
    scale = float(sm_scale) * math.log2(math.e)
    skv_real = skv - kv_pad

    bh = b * h
    qq = q.reshape(bh, sq, d)
    kk = k.reshape(bh, skv, d)
    vv = v.reshape(bh, skv, d)
    grid = (bh, sq // block_q, skv // block_k)
    common = dict(scale=scale, skv_real=skv_real, block_k=block_k,
                  kv_pad=int(kv_pad))

    maxes = pl.pallas_call(
        functools.partial(_max_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j: (g, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, 1, block_q), lambda g, i, j: (g, 0, i)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), q.dtype),  # scaled q
                pltpu.VMEM((8, block_q), jnp.float32),  # running row max
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qq, kk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j: (g, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j: (g, j, 0)),
                pl.BlockSpec((None, 1, block_q), lambda g, i, j: (g, 0, i)),
            ],
            out_specs=pl.BlockSpec((None, d, block_q), lambda g, i, j: (g, 0, i)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), q.dtype),  # scaled q
                pltpu.VMEM((d, block_q), jnp.float32),  # numerator
                pltpu.VMEM((8, block_q), jnp.float32),  # denominator row
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qq, kk, vv, maxes)
    return out.reshape(b, h, d, sq)
