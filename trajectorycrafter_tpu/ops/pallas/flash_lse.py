"""bf16 flash attention that also returns logsumexp (Pallas TPU).

The ring-attention combiner (ops/ring_attention.py) needs each per-shard
attention to report its softmax statistics.  The stock
jax.experimental.pallas flash kernel does not expose them, so this is the
in-repo kernel: same 3D-grid streaming structure as
ops/pallas/int8_flash_attention.py (q blocks parallel, kv blocks as the
"arbitrary" reduction with VMEM scratch), bf16 matmuls with fp32
accumulation, returning (out, lse).

Measured at the full single-chip DiT shape (2x48x30720x64, blocks 1024/1024):
546 ms vs the stock kernel's 345 -- the lse write adds overhead, so the
single-chip path keeps the stock kernel; inside the ring each shard is
S/sp long so this kernel only ever sees reduced shapes.  Note: block_k=512
at this shape trips a Mosaic FAILED_PRECONDITION; stick to 1024/1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
            *, sm_scale: float):
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
                                l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(j == n_kv - 1)
    def _out():
        l_final = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[:] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        lse_ref[:] = jnp.broadcast_to(m_scr[:] + jnp.log(l_final), lse_ref.shape)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention_with_lse(
    q: jnp.ndarray,  # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """-> (out (B, H, Sq, D), lse (B, H, Sq)) -- full (non-causal) attention.

    Sq and Skv must be multiples of the block sizes (callers pad; the ring
    shards are always block-aligned at production shapes).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)

    bh = b * h
    qq = q.reshape(bh, sq, d)
    kk = k.reshape(bh, skv, d)
    vv = v.reshape(bh, skv, d)
    grid = (bh, sq // block_q, skv // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j: (g, j, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j: (g, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j: (g, i, 0)),
                pl.BlockSpec((None, block_q, 128), lambda g, i, j: (g, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),  # acc
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qq, kk, vv)
    return out.reshape(b, h, sq, d), lse[:, :, 0].reshape(b, h, sq)


def flash_lse_inner(q, k, v, scale):
    """ring_attention-compatible inner: (out fp32, lse)."""
    out, lse = flash_attention_with_lse(q, k, v, sm_scale=scale)
    return out.astype(jnp.float32), lse
