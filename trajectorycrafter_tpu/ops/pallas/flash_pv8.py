"""PV-int8 flash attention (Pallas TPU): int8 probability x value matmul.

The transposed exp2 kernel (flash_exp2.py) leaves one quantifiable lever on
the table: its PV matmul runs bf16, and the v5e MXU doubles int8 throughput.
This variant keeps QK^T in bf16 (int8 QK^T measured no win -- the d=64
contraction is structurally half-occupied either way and the in-kernel score
rescale costs a VPU pass; docs/COVERAGE.md) and quantizes ONLY the
probability tile:

  * per-column (per-query) block max m replaces the fixed bias: p8 =
    round(exp2(s - m + log2 127)) lands exactly in [0, 127] with the best
    possible per-column resolution -- the subtraction that the exp2 kernel
    removed comes back, but the VPU row-sum it removed stays gone (the
    denominator rides the int8 matmul as a 127-valued ones channel, so
    padded keys are masked exactly by zeroing their ones entry);
  * v is quantized per-(batch, head) symmetric int8 OUTSIDE the kernel
    (one bandwidth-bound pass, same class as the q scale fold);
  * the PV matmul is int8 x int8 -> int32 on the MXU; the int32 block
    result is rescaled by exp2(m - log2 127) per column and accumulated in
    fp32, so per-block quantization scales compose exactly.

Folding: with m_adj = m - log2(127), acc[c<d] accumulates sum(v p)/v_scale
(the 127s cancel) and the ones channel accumulates 127 * sum(p), so the
final divide just multiplies by 127 * v_scale.

Accuracy: p is represented with ~log2(127) ~ 7 bits below each query's max;
softmax tails below max/254 round to zero.  Measured against the fp32
einsum in tests/test_attention_tpu.py (chip) and interpret mode (CPU).

Replaces: nothing by default -- bench_attention.py measures it against the
production bf16 kernel; docs/COVERAGE.md records the verdict (round-3 review
asked for the measured number either way).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# exp2 argument cap: exp2(88) * int32 accumulator stays < fp32 max
_CLAMP = 88.0
_LOG2_127 = math.log2(127.0)


def _kernel(scale_ref, q_ref, k_ref, v8_ref, o_ref, q_scr, acc_scr,
            *, out_dim: int, scale: float, kv_limit: int | None):
    g = pl.program_id(0)
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        q_scr[:] = (q_ref[:].astype(jnp.float32) * scale).astype(q_scr.dtype)

    # s_t (bk, bq) = k . (q*scale)^T -- bf16 MXU, fp32 out
    s_t = jax.lax.dot_general(
        k_ref[:], q_scr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s_t = jnp.minimum(s_t, _CLAMP)
    if kv_limit is not None:
        # Zero-padded K rows score 0 and would contaminate the per-query
        # block max whenever every real score is negative (crushing real
        # keys' p8 to 0); mask them out of the max explicitly.
        bk = s_t.shape[0]
        row = j * bk + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        s_t = jnp.where(row < kv_limit, s_t, -1e30)
    # per-query block max, shifted so the quantized max lands on 127;
    # floor at -_CLAMP so a fully-padded block yields p8 == 0 (not 127)
    m_adj = jnp.maximum(
        jnp.max(s_t, axis=0, keepdims=True) - _LOG2_127, -_CLAMP)  # (1, bq)
    p8 = jnp.round(jnp.exp2(s_t - m_adj)).astype(jnp.int8)
    # [numerator | 127*denominator] (d+1, bq) on the int8 MXU
    pv = jax.lax.dot_general(
        v8_ref[:], p8, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_scr[:] += pv.astype(jnp.float32) * jnp.exp2(m_adj)

    @pl.when(j == n_kv - 1)
    def _out():
        denom = jnp.maximum(acc_scr[out_dim:out_dim + 1, :], 1e-30)
        vs = scale_ref[g, 0]
        o_ref[:] = (acc_scr[:out_dim, :] / denom * (127.0 * vs)).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_pad", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention_exp2_t_pv8(
    q: jnp.ndarray,  # (B, H, Sq, D)
    k: jnp.ndarray,  # (B, H, Skv, D) -- last kv_pad rows must be ZERO
    v: jnp.ndarray,  # (B, H, Skv, D) -- last kv_pad rows must be ZERO
    kv_pad: int = 0,
    sm_scale: float | None = None,
    block_q: int = 2048,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention -> (B, H, D, Sq) (transposed output).

    Padded keys are masked exactly: their ones-channel entry is zeroed, so
    they contribute nothing to numerator (zero v rows) or denominator.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    assert sq % block_q == 0 and skv % block_k == 0, (sq, skv, block_q, block_k)

    # per-(batch, head) symmetric int8 v + a 127-valued ones channel that
    # carries the softmax denominator through the same matmul
    vf = v.astype(jnp.float32)
    vs = jnp.maximum(jnp.max(jnp.abs(vf), axis=(2, 3)), 1e-8) / 127.0  # (b, h)
    v8 = jnp.clip(jnp.round(vf / vs[..., None, None]), -127, 127)
    ones = jnp.where(jnp.arange(skv) < skv - kv_pad, 127.0, 0.0)
    ones = jnp.broadcast_to(ones[None, None, :, None], (b, h, skv, 1))
    v_ext8 = jnp.concatenate([v8, ones], axis=-1).astype(jnp.int8)

    bh = b * h
    qq = q.reshape(bh, sq, d)
    kk = k.reshape(bh, skv, d)
    vv = v_ext8.reshape(bh, skv, d + 1)
    scales = vs.reshape(bh, 1).astype(jnp.float32)
    grid = (bh, sq // block_q, skv // block_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel, out_dim=d, scale=float(sm_scale) * math.log2(math.e),
            kv_limit=(skv - kv_pad) if kv_pad else None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # v scales
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda g, i, j, *_: (g, i, 0)),
                pl.BlockSpec((None, block_k, d), lambda g, i, j, *_: (g, j, 0)),
                pl.BlockSpec((None, block_k, d + 1),
                             lambda g, i, j, *_: (g, j, 0)),
            ],
            out_specs=pl.BlockSpec((None, d, block_q),
                                   lambda g, i, j, *_: (g, 0, i)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), q.dtype),        # scaled q
                pltpu.VMEM((d + 1, block_q), jnp.float32),  # [num | 127*den]
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scales, qq, kk, vv)
    return out.reshape(b, h, d, sq)
