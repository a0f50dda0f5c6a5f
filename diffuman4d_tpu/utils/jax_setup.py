"""Process-wide JAX configuration.

Call :func:`setup` early (the CLI, bench, and graft entry do). Main effect:
the persistent compilation cache — the full-size UNet program takes minutes
to compile on this environment's remote-compile path, and caching makes
subsequent processes start in seconds.
"""

from __future__ import annotations

import os


_ALLOCATOR_TUNED = False


def tune_host_allocator() -> None:
    """Keep multi-MB host buffers on the reusable glibc heap.

    By default glibc serves allocations over 128 KB with a fresh ``mmap``
    and returns them with ``munmap`` — so every large numpy temporary
    (image decode, crop/resize, stacking) pays first-touch page faults
    again. On this VM the fault path runs at 22-48 MB/s while already-
    faulted pages copy at 1-9 GB/s (measured; ~100x), which made host-side
    sample assembly as expensive as the entire 44-window denoise. Raising
    the mmap threshold and disabling trim makes the heap high-water-mark
    persistent: each page faults once per process, not once per task.
    """
    global _ALLOCATOR_TUNED
    if _ALLOCATOR_TUNED:
        return
    _ALLOCATOR_TUNED = True
    # Preferred: the d4dmem NEP-49 numpy allocator (native/d4dmem) — big
    # numpy buffers come from MAP_SHARED anonymous mmap (fast-faulting,
    # THP-backed shmem on this VM: ~1.5 GB/s first touch vs 30-74 MB/s for
    # private-anon) with a size-class reuse cache (~10 GB/s steady state;
    # measured 48-frame stack 41 s -> 0.05 s). Caveat: MAP_SHARED pages
    # have no fork-COW, so fork-based multiprocessing must not mutate
    # pre-fork arrays — this repo only ever spawns fresh interpreters.
    try:
        import importlib.util
        import sysconfig

        ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
        so = os.path.join(
            os.path.dirname(__file__), "..", "..", "native", "d4dmem",
            f"d4dmem{ext}",
        )
        spec = importlib.util.spec_from_file_location("d4dmem", os.path.abspath(so))
        if spec is not None and os.path.isfile(so):
            d4dmem = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(d4dmem)
            d4dmem.install()
    except Exception:
        pass  # an optimization; fall through to the glibc tuning
    # Either way, keep big glibc allocations (PIL, d4dio temps) on the
    # reusable heap instead of munmap-returned fresh mappings.
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1)
    except Exception:
        pass  # an optimization; never fail over it (non-glibc hosts)


def setup(cache_dir: str | None = None) -> None:
    import jax

    tune_host_allocator()
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
