"""LoRA adapters for the CrossTransformer3D DiT.

Functional counterpart of the reference's ``create_network`` LoRA stack
(notebooks/05_11_25_training/lora_utils_ours/model_loader.py:92-120, rank 8 /
alpha 8 on attention + FF Denses): trainable (A, B) factor trees over frozen
base params, merged at apply time (W + (alpha/r) * A @ B).  The merged-weight
formulation keeps the training step one jit program and the adapters a plain
optax-compatible pytree.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGET_SUFFIXES = (
    "to_q", "to_k", "to_v", "to_out", "to_kv", "proj_in", "proj_out",
)


def _path_names(path) -> List[str]:
    return [getattr(p, "key", str(p)) for p in path]


def lora_target_paths(params: Any, target_suffixes=DEFAULT_TARGET_SUFFIXES,
                      skip_substrings=()) -> List[Tuple]:
    """Kernel paths eligible for LoRA (2D Dense kernels under target modules)."""
    out = []

    def visit(path, leaf):
        names = _path_names(path)
        if (
            names[-1] == "kernel"
            and leaf.ndim == 2
            and len(names) >= 2
            and names[-2] in target_suffixes
            and not any(s in "/".join(names) for s in skip_substrings)
        ):
            out.append(path)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def init_lora_params(key, params: Any, rank: int = 8,
                     target_suffixes=DEFAULT_TARGET_SUFFIXES,
                     skip_substrings=()) -> Dict[str, Any]:
    """-> flat dict {joined/path: {"a": (in, r), "b": (r, out)}}.

    A ~ N(0, 1/r), B = 0 (standard LoRA init: adapters start as identity).
    """
    paths = lora_target_paths(params, target_suffixes, skip_substrings)
    flat = {}
    leaves = {tuple(_path_names(p)): None for p in paths}
    by_path = {}

    def collect(path, leaf):
        names = tuple(_path_names(path))
        if names in leaves:
            by_path[names] = leaf
        return leaf

    jax.tree_util.tree_map_with_path(collect, params)

    keys = jax.random.split(key, max(len(by_path), 1))
    for k, (names, leaf) in zip(keys, sorted(by_path.items())):
        d_in, d_out = leaf.shape
        flat["/".join(names)] = {
            "a": jax.random.normal(k, (d_in, rank), jnp.float32) / rank,
            "b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return flat


def apply_lora(params: Any, lora: Dict[str, Any], alpha: float = 8.0,
               rank: int = 8) -> Any:
    """Merge adapters into a copy of the base param tree."""
    scaling = alpha / rank

    def merge(path, leaf):
        key = "/".join(_path_names(path))
        if key in lora:
            ab = lora[key]
            delta = (ab["a"] @ ab["b"]) * scaling
            return leaf + delta.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)
