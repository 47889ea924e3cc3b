"""Per-stage timing and observability.

Replaces the reference's ad-hoc gettimeofday spans and cudaEvent timer
(reference: Compressor.cu:356-399, gpuHuffmanConstruction.h:40-69) with a
structured stage timer that blocks on device results, so spans measure real
device time, and a report formatter mirroring the reference's stage prints
("Histograming took X ms", "construction time", "Encoding took X ms").
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    """Collects named wall-clock spans; device work must be blocked on by
    the caller (pass a jax array to ``stop`` or use ``stage(..., block=x)``)."""

    spans: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, block=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                _block(block)
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, total_bytes: int | None = None) -> str:
        lines = []
        for name, dt in self.spans.items():
            line = f"{name}: {dt * 1000:.2f} ms"
            if total_bytes:
                line += f" ({total_bytes / dt / 1e9:.2f} GB/s)"
            lines.append(line)
        return "\n".join(lines)


def _block(x):
    """Force completion of device work.

    ``block_until_ready`` alone is unreliable on tunneled/async backends, so
    we additionally fetch one element of every output to the host — a
    guaranteed synchronization point with negligible transfer cost."""
    import jax
    import numpy as np

    def sync(a):
        if hasattr(a, "block_until_ready"):
            a.block_until_ready()
            # One-element fetch: queued after `a`, so its arrival proves
            # the producing computation finished.
            np.asarray(jax.device_get(a.reshape(-1)[:1]))
        return a

    jax.tree.map(sync, x)


def time_fn(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    """Median steady-state seconds per call; blocks on all outputs."""
    for _ in range(warmup):
        _block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
