"""Tracing and timing (SURVEY §5: the reference has no profiling beyond
tqdm bars; this provides phase timers + jax.profiler integration).

Usage::

    from diffuman4d_tpu.utils.tracing import phase, report, trace_to

    with phase("denoise/spatial"):            # wall-clock, device-synced
        ...
    print(report())

    with trace_to("/tmp/jax-trace"):          # XLA profiler (tensorboard)
        ...
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict

log = logging.getLogger(__name__)

_TIMES: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str, sync: bool = True):
    """Time a phase; syncs outstanding device work at exit so the number
    means something (block_until_ready on a trivial op)."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            jax.block_until_ready(jax.numpy.zeros(()))
        _TIMES[name].append(time.perf_counter() - t0)


def report(reset: bool = False) -> dict[str, dict]:
    out = {}
    for name, vals in _TIMES.items():
        out[name] = {
            "count": len(vals),
            "total_s": round(sum(vals), 4),
            "mean_s": round(sum(vals) / len(vals), 4),
            "max_s": round(max(vals), 4),
        }
    if reset:
        _TIMES.clear()
    return out


def dump_report(path: str) -> None:
    with open(path, "w") as f:
        json.dump(report(), f, indent=2)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """XLA device profile (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


class RankedLogger(logging.LoggerAdapter):
    """Process-index-prefixed logger (reference RankedLogger hardcodes rank
    0, pylogger.py:38; here the rank is jax.process_index())."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False):
        super().__init__(logging.getLogger(name), {})
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, **kwargs):
        if not self.isEnabledFor(level):
            return
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
        if self.rank_zero_only and rank != 0:
            return
        super().log(level, f"[rank{rank}] {msg}", *args, **kwargs)
