"""Profiling helpers: the TPU-era replacement for the reference's cudaEvent
timers and ptxas occupancy dumps (SURVEY.md §5).

``trace(dir)`` wraps ``jax.profiler.trace`` (view with TensorBoard or
xprof); ``dump_hlo(fn, *args)`` returns the optimized HLO text for a jitted
function — the compiler-eye view that replaces --ptxas-options=-v.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/htpu-trace"):
    """Capture a device trace around a block (no-op if the profiler is
    unavailable on this backend, e.g. some tunneled environments)."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield log_dir
    except Exception:
        yield None


def dump_hlo(fn, *args, **kwargs) -> str:
    """Optimized HLO for ``fn(*args)`` (fn may be jitted or plain)."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        return lowered.compile().as_text()
    except Exception:
        return lowered.as_text()
