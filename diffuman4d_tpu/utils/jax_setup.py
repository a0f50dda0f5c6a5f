"""Process-wide JAX configuration.

Call :func:`setup` early (the CLI, bench, and graft entry do). Main effect:
the persistent compilation cache — the full-size UNet program takes minutes
to compile on this environment's remote-compile path, and caching makes
subsequent processes start in seconds.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail setup over it
