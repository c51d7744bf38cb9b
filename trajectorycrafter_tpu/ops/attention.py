"""Attention dispatch: XLA reference path + Pallas flash-attention path.

The DiT's joint text+video self-attention runs over ~13.3k tokens at 384x672
(226 text + 13x24x42 video; reference crosstransformer3d.py:496-506).  An
(S, S) score matrix in fp32 is ~34 GB across 48 heads -- far beyond VMEM/HBM
comfort -- so the production path is the tiled Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention); the XLA einsum path is the
numerically transparent reference used by tests and tiny configs.

Sequences are padded to the kernel's block multiple; padded key/value tokens
are masked via SegmentIds so results are identical to the unpadded einsum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    """(B, H, S, D) einsum attention with fp32 softmax."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def _flash_attention(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, sq, d = q.shape
    skv = k.shape[2]
    # bigger tiles help MXU utilisation, but the stock kernel's running-max
    # state makes bq=2048 overflow the 16M scoped VMEM at some shapes (e.g.
    # the depth UNet's 49x5x9216x64 with segment ids); 1024/1024 fits
    if min(sq, skv) >= 8192:
        block_q, block_k = 1024, 1024
    elif min(sq, skv) >= 512:
        block_q, block_k = 512, 512
    else:
        block_q, block_k = 128, 128
    qp, sq_orig = _pad_to(q, block_q, axis=2)
    kp, skv_orig = _pad_to(k, block_k, axis=2)
    vp, _ = _pad_to(v, block_k, axis=2)
    sq_p, skv_p = qp.shape[2], kp.shape[2]
    if sq_p != sq_orig or skv_p != skv_orig:
        # valid tokens segment 1, padding segment 0 (pads only attend pads)
        q_ids = (jnp.arange(sq_p) < sq_orig).astype(jnp.int32)
        kv_ids = (jnp.arange(skv_p) < skv_orig).astype(jnp.int32)
        seg = SegmentIds(
            q=jnp.broadcast_to(q_ids, (b, sq_p)),
            kv=jnp.broadcast_to(kv_ids, (b, skv_p)),
        )
    else:
        seg = None
    sizes = BlockSizes(
        block_q=min(block_q, sq_p), block_k_major=min(block_k, skv_p),
        block_k=min(block_k, skv_p), block_b=1,
    )
    out = flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale, block_sizes=sizes)
    return out[:, :, :sq_orig]


def _flash_exp2_t(q, k, v, scale):
    """Production TPU path: the MXU-offloaded exp2 kernel (transposed PV).

    Measured at the DiT shape (2x48x30720x64): 217 ms/call vs the stock
    kernel's 342 (bench_attention.py).  Pads to the block multiple; padded
    keys are exactly masked via the kernel's validity column.  Returns
    (B, H, Sq, D).
    """
    from trajectorycrafter_tpu.ops.pallas.flash_exp2 import flash_attention_exp2_t

    b, h, s, d = q.shape
    block_q, block_k = (2048, 1024) if s >= 2048 else (512, 512)
    qp, s_orig = _pad_to(q, block_q, axis=2)
    kp, skv_orig = _pad_to(k, block_k, axis=2)
    vp, _ = _pad_to(v, block_k, axis=2)  # zero pads, as the kernel requires
    sp, skv_p = qp.shape[2], kp.shape[2]
    out_t = flash_attention_exp2_t(
        qp, kp, vp, kv_pad=skv_p - skv_orig, sm_scale=scale,
        block_q=min(block_q, sp), block_k=min(block_k, skv_p),
    )  # (B, H, D, Sp)
    return jnp.swapaxes(out_t, 2, 3)[:, :, :s_orig]


def _flash_maxpass(q, k, v, scale):
    """Two-pass true-max exp2 kernel (ops/pallas/flash_max.py): exact for
    UNBOUNDED scores (no QK-norm), so it is the fast candidate for the
    DepthCrafter SVD UNet's big self-attention.  Same padding contract as
    _flash_exp2_t; padded keys are masked inside both passes."""
    from trajectorycrafter_tpu.ops.pallas.flash_max import (
        flash_attention_maxpass,
    )

    b, h, s, d = q.shape
    block_q, block_k = (2048, 1024) if s >= 2048 else (512, 512)
    qp, s_orig = _pad_to(q, block_q, axis=2)
    kp, skv_orig = _pad_to(k, block_k, axis=2)
    vp, _ = _pad_to(v, block_k, axis=2)
    sp, skv_p = qp.shape[2], kp.shape[2]
    out_t = flash_attention_maxpass(
        qp, kp, vp, kv_pad=skv_p - skv_orig, sm_scale=scale,
        block_q=min(block_q, sp), block_k=min(block_k, skv_p),
    )  # (B, H, D, Sp)
    return jnp.swapaxes(out_t, 2, 3)[:, :, :s_orig]


def _flash_exp2_t_pv8(q, k, v, scale):
    """PV-int8 variant of the production kernel: QK^T bf16, probability x
    value on the int8 MXU (ops/pallas/flash_pv8.py).  Same padding contract
    as _flash_exp2_t; padded keys are masked via the zeroed ones channel."""
    from trajectorycrafter_tpu.ops.pallas.flash_pv8 import (
        flash_attention_exp2_t_pv8,
    )

    b, h, s, d = q.shape
    block_q, block_k = (2048, 1024) if s >= 2048 else (512, 512)
    qp, s_orig = _pad_to(q, block_q, axis=2)
    kp, skv_orig = _pad_to(k, block_k, axis=2)
    vp, _ = _pad_to(v, block_k, axis=2)
    sp, skv_p = qp.shape[2], kp.shape[2]
    out_t = flash_attention_exp2_t_pv8(
        qp, kp, vp, kv_pad=skv_p - skv_orig, sm_scale=scale,
        block_q=min(block_q, sp), block_k=min(block_k, skv_p),
    )  # (B, H, D, Sp)
    return jnp.swapaxes(out_t, 2, 3)[:, :, :s_orig]


def multi_head_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Full (non-causal) MHA.  Returns (B, S, H*D)."""
    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))  # (B, H, S, D)
    if impl == "auto":
        on_tpu = jax.devices()[0].platform != "cpu"
        impl = "flash" if (on_tpu and s * k.shape[1] >= 1024 * 1024) else "xla"
    if impl == "flash":
        out = _flash_exp2_t(qt, kt, vt, scale)
    elif impl == "flash_pv8":
        out = _flash_exp2_t_pv8(qt, kt, vt, scale)
    elif impl == "flash_max":
        out = _flash_maxpass(qt, kt, vt, scale)
    elif impl == "flash_stock":
        out = _flash_attention(qt, kt, vt, scale)
    elif impl == "ring":
        # true sequence-parallel attention over the ambient mesh's sp axis
        from trajectorycrafter_tpu.ops.ring_attention import ring_attention

        mesh = jax.sharding.get_abstract_mesh()
        out = ring_attention(qt, kt, vt, mesh, axis_name="sp", scale=scale)
    else:
        out = _xla_attention(qt, kt, vt, scale)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, h * d)
