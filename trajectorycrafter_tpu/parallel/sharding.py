"""Sharding rules for the DiT parameter tree and pipeline activations.

Tensor-parallel layout for CogVideoX blocks (dim D = heads x head_dim):
  * attn to_q/to_k/to_v kernels (D, D): shard output features (heads) on tp
  * attn to_out kernel (D, D): shard input features on tp (row-parallel);
    XLA inserts the psum
  * ff proj_in (D, 4D): shard 4D on tp; ff proj_out (4D, D): shard 4D on tp
  * perceiver to_q/to_kv: column-parallel; to_out row-parallel
  * everything else (norms, embeddings, modulation Denses): replicated

Batch rides ``dp``; the video-token sequence is constrained to ``sp`` inside
the model between attention layers.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_PARALLEL = ("to_q", "to_k", "to_v", "to_kv", "proj_in")
_ROW_PARALLEL = ("to_out", "proj_out")


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    parent = names[-2] if len(names) >= 2 else ""
    # int8 per-output-channel scales follow their kernel's output sharding
    if names[-1] == "scale" and leaf.ndim == 1:
        return P("tp") if parent in _COL_PARALLEL else P()
    if leaf.ndim < 2:
        return P()
    # Dense kernels are (in_features, out_features); int8 kernel_q likewise
    if names[-1] in ("kernel", "kernel_q"):
        if parent in _COL_PARALLEL:
            return P(None, "tp")
        if parent in _ROW_PARALLEL and "blocks" in "/".join(names):
            return P("tp", None)
        if parent in _ROW_PARALLEL and "perceiver" in "/".join(names):
            return P("tp", None)
    return P()


def dit_param_sharding(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for the CrossTransformer3DModel params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)), params
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding tree: leading axis on dp (batch / CFG pair).

    Contract: every array leaf carries the batch as its LEADING axis
    (rope tables and other batchless side-cars must not be in the tree);
    scalars replicate.
    """
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, P() if np.ndim(leaf) == 0
            else P("dp", *([None] * (np.ndim(leaf) - 1)))), tree
    )


def constrain(x, *axes):
    """with_sharding_constraint helper usable inside jit under a mesh context."""
    return jax.lax.with_sharding_constraint(x, P(*axes))
