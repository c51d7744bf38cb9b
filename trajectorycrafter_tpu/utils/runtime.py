"""Runtime setup helpers shared by every entry point."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/trajcrafter_tpu_xla") -> None:
    """Persistent XLA compilation cache: repeated CLI invocations reuse
    compiled programs instead of paying 30s+ compiles per process."""
    import jax

    cache_dir = os.path.expanduser(os.environ.get("TRAJCRAFTER_XLA_CACHE", path))
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        # XLA's CPU AOT cache re-checks machine features at load and
        # complains even for same-host entries (and CPU compiles are cheap);
        # the persistent cache only pays for itself on accelerators.  TPU
        # entries keep the original unscoped path (preserves the warm cache).
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
