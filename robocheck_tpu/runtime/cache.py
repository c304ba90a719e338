"""Persistent XLA compilation cache.

The fused mega-kernel's Mosaic compile is expensive (minutes on a cold
tethered TPU); the reference paid an analogous fixed cost by re-reading and
re-uploading meshes per run (45-50 ms, report §4.8) but recompiled nothing.
Enabling JAX's persistent compilation cache makes every process after the
first pay only a disk read per (kernel, shape) pair. Called by the CLI
surfaces (bench.py, scripts/, __graft_entry__.py); library users opt in.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "robocheck_tpu", "xla_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    Returns the cache directory in use. Safe to call before or after JAX
    backend initialization; honors an explicit JAX_COMPILATION_CACHE_DIR.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(_DEFAULT_DIR, jax.default_backend())
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
