"""Stage-wise host offload of model parameters.

TPU-native analog of the reference's CPU-offload hooks
(/root/reference/models/infer.py:34-43 ``enable_model_cpu_offload`` /
``enable_sequential_cpu_offload``; demo.py keeps every model resident on a
large A100).  A real-weight bundle here is ~35 GB of bf16 parameters --
6.1B DiT (12.2 GB) + 4.7B T5-XXL (9.4 GB) + SVD UNet + CLIP-H + BLIP-2 --
which cannot be simultaneously resident in one v5e chip's 16 GB HBM.

``StageParams`` keeps a model's weights host-resident (numpy; bf16 via
ml_dtypes) and places them on device only while that model's pipeline stage
runs.  ``release()`` drops the device copy so the next stage has the chip
to itself; with ``offload=False`` the device copy is kept (today's
always-resident behaviour, right for small models and big-HBM slices).

Plain pytrees pass through ``resolve``/``release`` untouched, so every
pipeline keeps accepting ordinary param trees (tests, dev stubs, sharded
runs).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class StageParams:
    """Host-resident parameter tree, device-placed per stage.

    Exactly one of ``host_tree`` / ``materialize`` must be given:
      * ``host_tree``: numpy pytree (the production path -- converted
        checkpoints stay in host RAM between stages);
      * ``materialize``: zero-arg callable returning a device pytree (the
        synthetic-bench path -- regenerating on device avoids pushing GBs
        through the slow axon host->device relay).
    """

    def __init__(self, host_tree: Any = None,
                 materialize: Optional[Callable[[], Any]] = None,
                 offload: bool = True, name: str = ""):
        if (host_tree is None) == (materialize is None):
            raise ValueError("pass exactly one of host_tree / materialize")
        self._host = host_tree
        self._materialize = materialize
        self._device: Any = None
        self.offload = offload
        self.name = name

    def device(self) -> Any:
        """Device param tree (cached until release)."""
        if self._device is None:
            if self._materialize is not None:
                self._device = self._materialize()
            else:
                self._device = jax.device_put(self._host)
        return self._device

    def release(self) -> None:
        """Drop the device copy (no-op unless ``offload``).

        Deletes every leaf buffer EXPLICITLY instead of relying on refcount
        GC: through a remote-backend relay the GC-triggered async deletes
        can lag the next stage's allocations (observed on chip as
        RESOURCE_EXHAUSTED at stage boundaries with only ~12 GB of live
        params), while ``Array.delete()`` issues the deletion synchronously.
        """
        if self.offload and self._device is not None:
            for leaf in jax.tree_util.tree_leaves(self._device):
                try:
                    leaf.delete()
                except Exception:
                    pass  # non-jax leaves / already-deleted buffers
            self._device = None

    def nbytes(self) -> int:
        tree = self._host if self._host is not None else self._device
        if tree is None:
            return 0
        return sum(int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
                   for l in jax.tree_util.tree_leaves(tree))

    def __enter__(self):
        return self.device()

    def __exit__(self, *exc):
        self.release()
        return False


def resolve(params: Any) -> Any:
    """Device tree for either a StageParams or a plain pytree."""
    return params.device() if isinstance(params, StageParams) else params


def host_or_device(params: Any) -> Any:
    """Tree for *sharded placement*: the host copy when one exists, else the
    resolved tree.  A sharded ``jax.device_put`` from host streams each leaf
    straight to its shards; resolving first would transiently hold the full
    unsharded tree on the default device (full 12.2 GB DiT + its own shard
    on chip 0 -- exactly what offload mode exists to avoid)."""
    if isinstance(params, StageParams) and params._host is not None:
        return params._host
    return resolve(params)


def release(params: Any) -> None:
    if isinstance(params, StageParams):
        params.release()


def tree_nbytes(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
               for l in jax.tree_util.tree_leaves(tree))


def device_hbm_bytes(default: int = 16 * 1024**3) -> int:
    """Best-effort accelerator memory size (bytes_limit when exposed)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return default


def should_offload(total_param_bytes: int, fraction: float = 0.8) -> bool:
    """Auto policy: offload when the bundle cannot comfortably co-reside.

    The budget leaves ``1 - fraction`` of HBM for activations/latents; a
    bundle under it runs fully resident (no per-stage transfer cost).
    """
    return total_param_bytes > fraction * device_hbm_bytes()


def host_cast(tree: Any, dtype) -> Any:
    """Cast a pytree to ``dtype`` on the HOST (numpy; bf16 via ml_dtypes).

    Structure-aware for int8-quantized Dense leaves: ``kernel_q`` stays
    int8 and its fp32 ``scale`` side-car is NOT downcast (ops/int8.py).
    """
    dt = jnp.dtype(dtype)

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out = {"kernel_q": np.asarray(node["kernel_q"]),
                       "scale": np.asarray(node["scale"], np.float32)}
                if "bias" in node:
                    out["bias"] = np.asarray(node["bias"]).astype(dt)
                return out
            return {k: walk(v) for k, v in node.items()}
        return np.asarray(node).astype(dt)

    return walk(tree)
