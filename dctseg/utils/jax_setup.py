"""Process-level JAX configuration helpers."""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "") -> None:
    """Persistent compilation cache: repeated driver runs with identical
    configs skip the multi-minute XLA compile of the full train step."""
    import jax
    path = path or os.environ.get(
        "DCTSEG_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
