"""Pipeline parallelism over the DiT's transformer blocks (GPipe schedule).

The reference has no pipeline parallelism (SURVEY.md parallelism table:
"absent ... optional stage split of 42 blocks").  This module supplies the
TPU-native capability: the 42 CogVideoX blocks + 21 interleaved Perceiver
cross-attention layers (reference crosstransformer3d.py:831-838) are grouped
into 21 "superblocks" (block 2i -> perceiver i -> block 2i+1), split into
contiguous stages over a ``pp`` mesh axis, and executed with GPipe
microbatching: activations travel stage-to-stage via ``lax.ppermute`` while
each stage scans its own stacked superblock parameters.

Scaling shape: per-device block FLOPs and weight memory divide by the stage
count; the bubble fraction is (S-1)/(M+S-1) for S stages and M microbatches,
so pp pays off on ICI-poor topologies or when tensor/sequence sharding is
exhausted -- the default production path remains dp x sp x tp
(parallel/sharding.py), and this runner is parity-tested against the
sequential block loop on a virtual mesh (tests/test_pipeline_parallel.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from trajectorycrafter_tpu.models.dit import (
    CogVideoXBlock,
    PerceiverCrossAttention,
)


def stack_superblock_params(params, num_layers: int, cross_attn_interval: int,
                            n_stages: int):
    """Restack the DiT's per-block param subtrees into a (S, n_su, ...) tree.

    Superblock i = [blocks_{2i}, perceiver_cross_attention_{i},
    blocks_{2i+1}] for interval 2; ``n_stages`` must divide the superblock
    count (21 for the deployed 42-block model -> S in {3, 7, 21}).
    """
    assert cross_attn_interval == 2, "superblock layout assumes interval 2"
    n_su = num_layers // 2
    assert n_su % n_stages == 0, (n_su, n_stages)
    sus = []
    for i in range(n_su):
        sus.append({
            "a": params[f"blocks_{2 * i}"],
            "p": params[f"perceiver_cross_attention_{i}"],
            "b": params[f"blocks_{2 * i + 1}"],
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *sus)
    # (n_su, ...) -> (S, n_su/S, ...)
    return jax.tree.map(
        lambda x: x.reshape(n_stages, n_su // n_stages, *x.shape[1:]), stacked)


def stacked_param_sharding(stage_params, mesh, axis_name: str = "pp"):
    """NamedSharding tree for stacked superblock params: stage dim on
    ``axis_name``, kernels tensor-parallel on ``tp`` (when the mesh has one).

    Re-applies the per-block tp rules from ``sharding._spec_for_path`` by
    aliasing the stacked top-level keys ("a"/"b" -> blocks, "p" -> perceiver)
    and stripping the two leading stack dims (S, n_su).
    """
    from types import SimpleNamespace

    from jax.sharding import NamedSharding

    from trajectorycrafter_tpu.parallel.sharding import _spec_for_path

    has_tp = "tp" in mesh.shape and mesh.shape["tp"] > 1
    alias = {"a": "blocks_0", "b": "blocks_0", "p": "perceiver_cross_attention_0"}

    def spec(path, leaf):
        names = [alias.get(getattr(p, "key", str(p)), getattr(p, "key", str(p)))
                 for p in path]
        inner = P()
        if has_tp and leaf.ndim > 2:
            fake_path = tuple(SimpleNamespace(key=n) for n in names)
            fake_leaf = jax.ShapeDtypeStruct(leaf.shape[2:], leaf.dtype)
            inner = _spec_for_path(fake_path, fake_leaf)
        return NamedSharding(mesh, P(axis_name, None, *tuple(inner)))

    return jax.tree_util.tree_map_with_path(spec, stage_params)


def pipeline_dit_blocks(
    model,  # CrossTransformer3DModel (for block hyper-params)
    stage_params,  # stacked tree (S, n_su/S, ...), sharded P("pp") on dim 0
    hidden: jnp.ndarray,  # (B, S_vid, D)
    encoder: jnp.ndarray,  # (B, S_txt, D)
    temb: jnp.ndarray,  # (B, time_dim)
    rope: Tuple,  # (cos, sin) tables, replicated
    cross_tokens: jnp.ndarray,  # (B, S_ref, D)
    mesh,
    n_microbatches: int = 2,
    axis_name: str = "pp",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the whole block stack pipelined over ``mesh[axis_name]``.

    Returns (hidden, encoder) identical (up to fp rounding) to the
    sequential loop in CrossTransformer3DModel.__call__ step 4.
    """
    n_stages = mesh.shape[axis_name]
    b = hidden.shape[0]
    m = n_microbatches
    assert b % m == 0, (b, m)
    mb = b // m

    # mirror the sequential loop's block construction exactly (dit.py step 4):
    # quant must match or int8 stage params fail param lookup, and remat must
    # carry over or the pp runner loses activation rematerialization
    block_cls = CogVideoXBlock
    if model.remat:
        block_cls = nn.remat(CogVideoXBlock, static_argnums=())
    block = block_cls(
        model.inner_dim, model.num_attention_heads, model.attention_head_dim,
        attention_impl=model.attention_impl, quant=model.quant,
        dtype=model.dtype, param_dtype=model.param_dtype)
    perceiver = PerceiverCrossAttention(
        model.inner_dim, model.cross_attn_dim_head, model.cross_attn_num_heads,
        attention_impl=model.attention_impl, quant=model.quant,
        dtype=model.dtype, param_dtype=model.param_dtype)

    def stage_fn(su_stack, h, e, t, cross):
        def body(carry, su):
            hh, ee = carry
            hh, ee = block.apply({"params": su["a"]}, hh, ee, t, rope)
            hh = hh + perceiver.apply({"params": su["p"]}, cross, hh)
            hh, ee = block.apply({"params": su["b"]}, hh, ee, t, rope)
            return (hh, ee), None

        (h, e), _ = jax.lax.scan(body, (h, e), su_stack)
        return h, e

    # microbatch the batch-dependent inputs: (M, mb, ...)
    def split(x):
        return x.reshape(m, mb, *x.shape[1:])

    h_mb, e_mb, t_mb, c_mb = map(split, (hidden, encoder, temb, cross_tokens))

    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def pipelined(su_stack, h_in, e_in, t_in, c_in):
        su_stack = jax.tree.map(lambda x: x[0], su_stack)  # drop stage dim
        idx = jax.lax.axis_index(axis_name)
        zeros_h = jnp.zeros_like(h_in[0])
        zeros_e = jnp.zeros_like(e_in[0])
        buf_h, buf_e = zeros_h, zeros_e
        out_h = jnp.zeros((m,) + h_in.shape[1:], h_in.dtype)
        out_e = jnp.zeros((m,) + e_in.shape[1:], e_in.dtype)
        for t_step in range(m + n_stages - 1):
            # stage s works on microbatch t_step - s; every stage runs every
            # step (inactive results are discarded by the where/permute)
            mb_idx = jnp.clip(t_step - idx, 0, m - 1)
            # stage 0 ingests fresh microbatches, others the received buffer
            h_cur = jnp.where(idx == 0, h_in[jnp.clip(t_step, 0, m - 1)], buf_h)
            e_cur = jnp.where(idx == 0, e_in[jnp.clip(t_step, 0, m - 1)], buf_e)
            h_out, e_out = stage_fn(su_stack, h_cur, e_cur, t_in[mb_idx],
                                    c_in[mb_idx])
            active = (t_step - idx >= 0) & (t_step - idx < m)
            # collect finished microbatches on the LAST stage
            done = active & (idx == n_stages - 1)
            out_h = out_h.at[mb_idx].set(
                jnp.where(done, h_out, out_h[mb_idx]))
            out_e = out_e.at[mb_idx].set(
                jnp.where(done, e_out, out_e[mb_idx]))
            # hand activations to the next stage
            buf_h = jax.lax.ppermute(h_out, axis_name, fwd_perm)
            buf_e = jax.lax.ppermute(e_out, axis_name, fwd_perm)
        # broadcast the last stage's collected outputs to every device
        last = (jax.lax.axis_index(axis_name) == n_stages - 1).astype(out_h.dtype)
        out_h = jax.lax.psum(out_h * last, axis_name)
        out_e = jax.lax.psum(out_e * last, axis_name)
        return out_h, out_e

    spec_stage = P(axis_name)
    rep = P()
    # manual ONLY over the pp axis: any other axis on ``mesh`` (e.g. tp)
    # stays automatic, so stage params committed with tensor-parallel
    # shardings keep them inside the stage body and GSPMD inserts the tp
    # collectives -- pp composes with tp on one mesh.  The jit wrapper is
    # required: the EAGER shard_map path reshards operands over ALL mesh
    # axes (jax 0.9 _unmatch dst = P(mesh.axis_names)), which trips the
    # manual-axis check whenever the mesh carries a non-manual axis.
    fn = jax.jit(jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: spec_stage, stage_params),
                  rep, rep, rep, rep),
        out_specs=(rep, rep),
        axis_names={axis_name},
        check_vma=False,
    ))
    out_h, out_e = fn(stage_params, h_mb, e_mb, t_mb, c_mb)
    return out_h.reshape(b, *out_h.shape[2:]), out_e.reshape(b, *out_e.shape[2:])
