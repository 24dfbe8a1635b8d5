"""Persistent XLA compilation cache.

The X3D-L train step is a deep graph; cold compilation through the TPU
remote-compile service is minutes. Enabling JAX's persistent cache makes
every subsequent process start instant. Called by the CLI, bench, and driver
entry points.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> str:
    global _ENABLED
    import jax

    path = path or os.environ.get(
        "CHANGE3D_JAX_CACHE", os.path.expanduser("~/.cache/change3d_jax")
    )
    if not _ENABLED:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _ENABLED = True
    return path
