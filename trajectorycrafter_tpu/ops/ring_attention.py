"""Ring attention: true sequence-parallel attention over the ``sp`` mesh axis.

Why this exists: XLA cannot partition a Pallas custom call, so under naive
sp-sharding the flash-attention kernel would force an all-gather of K/V and
replicate the full softmax work on every chip.  Ring attention keeps q
sharded, rotates the K/V shards around the ring (``jax.lax.ppermute``), and
combines the per-shard partial attentions with online-softmax statistics --
the heads x S^2 score work (the measured VPU bottleneck, docs/COVERAGE.md)
then divides linearly across the sp axis.

The inner per-shard attention is pluggable: the default einsum path (exact,
used for CPU-mesh validation) or any kernel returning (out, logsumexp).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _attention_with_lse(q, k, v, scale,
                        key_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact blockwise attention returning (out, lse); (B, H, S, D) layout.

    ``key_mask`` (Sk,) bool marks valid keys -- padded positions score -1e30
    (finite, so a fully-masked visiting shard yields lse ~ -1e30 instead of
    NaN-producing -inf and washes out in the online-softmax combine)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[None, None, None, :], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    lse = (m + jnp.log(l))[..., 0]  # (B, H, Sq)
    return out / jnp.maximum(l, 1e-30), lse


def _combine(o1, lse1, o2, lse2):
    """Merge two attention partials with their logsumexps."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)[..., None]
    w2 = jnp.exp(lse2 - m)[..., None]
    o = (o1 * w1 + o2 * w2) / (w1 + w2)
    lse = m + jnp.log(jnp.exp(lse1 - m) + jnp.exp(lse2 - m))
    return o, lse


def ring_attention(
    q: jnp.ndarray,  # (B, H, S, D) -- S sharded over axis_name inside shard_map
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    axis_name: str = "sp",
    scale: float = None,
    inner: Callable = _attention_with_lse,
) -> jnp.ndarray:
    """Full (non-causal) attention with S sharded over ``axis_name``.

    Inputs/outputs are global arrays; shard_map handles the distribution.
    Each ring step computes q_local x kv_visiting and folds the result into
    the running online-softmax state while the kv shard travels to the next
    device (guide pattern: ring collectives).

    Uneven token counts are handled by pad-and-mask: S is zero-padded up to
    a multiple of the ring size and the padded KEY positions are masked out
    of every softmax (padded QUERY rows compute garbage and are sliced off).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]

    # Custom inners (e.g. the pallas flash-lse wrapper) may not take a
    # key_mask kwarg; detect once so the pad path works for any inner.
    # Only an EXPLICIT key_mask parameter counts: a **kwargs inner that
    # accepted-but-ignored the mask would silently skip both the mask and
    # the analytic correction (advisor r4) -- such inners take the
    # maskless-correction path instead.
    import inspect
    _params = inspect.signature(inner).parameters
    inner_takes_mask = "key_mask" in _params

    s_true = q.shape[2]
    pad = (-s_true) % n
    if pad:
        zeros = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v = zeros(q), zeros(k), zeros(v)
    s_loc = q.shape[2] // n

    def local(q_l, k_l, v_l):
        def step(carry, t):
            o_acc, lse_acc, k_cur, v_cur = carry
            # issue the next-hop transfer BEFORE the local attention compute:
            # the permuted kv isn't consumed until the next scan iteration,
            # so XLA's async collective-permute can ride under this
            # iteration's inner() compute instead of serialising after it
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            if pad:
                # after t rotations device i holds kv shard (i - t) mod n;
                # mask that shard's positions beyond the true length
                me = jax.lax.axis_index(axis_name)
                visiting = jax.lax.rem(me - t + n, n)
                pos = visiting * s_loc + jnp.arange(s_loc)
                key_mask = pos < s_true
                if inner_takes_mask:
                    o_i, lse_i = inner(q_l, k_cur, v_cur, scale,
                                       key_mask=key_mask)
                else:
                    # The inner ran a plain softmax over the zero-padded
                    # keys.  Each padded key scores exactly 0 (zero K row)
                    # so it adds exp(0) = 1 to the denominator and nothing
                    # to the numerator (zero V row) -- remove those terms
                    # exactly: l_true = l_incl - n_pad, done in log domain.
                    o_i, lse_i = inner(q_l, k_cur, v_cur, scale)
                    n_pad_here = jnp.sum(
                        jnp.logical_not(key_mask)).astype(jnp.float32)
                    keep = 1.0 - n_pad_here * jnp.exp(-lse_i)
                    # Precision bound (advisor r4): computed in fp32, keep
                    # below ~1e-6 is dominated by cancellation noise (the
                    # real-key softmax mass is ~ulp of the pad mass), so such
                    # shards are treated as empty -- their true contribution
                    # to the combined softmax is negligible by the same
                    # ratio.  Mask-capable inners avoid this path entirely.
                    empty = keep <= 1e-6
                    keep_safe = jnp.maximum(keep, 1e-30)
                    lse_i = jnp.where(empty, -1e30,
                                      lse_i + jnp.log(keep_safe))
                    o_i = jnp.where(empty[..., None], 0.0,
                                    o_i / keep_safe[..., None])
            else:
                o_i, lse_i = inner(q_l, k_cur, v_cur, scale)
            o_acc, lse_acc = _combine(o_acc, lse_acc, o_i, lse_i)
            return (o_acc, lse_acc, k_nxt, v_nxt), None

        # the carry must be marked "varying" over the ring axis for scan
        _vary = getattr(jax.lax, "pcast", None)
        if _vary is not None:
            vary = lambda x: _vary(x, axis_name, to="varying")
        else:  # older jax
            vary = lambda x: jax.lax.pvary(x, (axis_name,))
        o0 = vary(jnp.zeros(q_l.shape[:3] + (v_l.shape[-1],), jnp.float32))
        lse0 = vary(jnp.full(q_l.shape[:3], -jnp.inf, jnp.float32))
        (o, _, _, _), _ = jax.lax.scan(step, (o0, lse0, k_l, v_l),
                                       jnp.arange(n))
        return o.astype(q_l.dtype)

    spec = P(None, None, axis_name, None)
    # check_vma off: pallas_call inner kernels don't annotate varying axes
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    out = fn(q, k, v)
    return out[:, :, :s_true] if pad else out
