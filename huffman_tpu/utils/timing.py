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


def amortized_time_fn(fn, arg, iters: int = 20, reps: int = 3) -> float:
    """Median seconds per call of ``fn(arg)``, measured by chaining
    ``iters`` invocations inside ONE jit program.

    Each iteration xors a live checksum of the previous output into the
    input's first element, a semantics-light but real data dependency: XLA
    can neither hoist the op out of the loop nor dead-code it (a checksum
    it can fold — e.g. ``x * 0`` — silently removes the op under test).
    This amortizes fixed dispatch overhead (~50 ms through the axon tunnel
    here) that per-call timing cannot separate from the kernel.

    ``arg`` must be an integer-dtype array; ``fn`` any jit-compatible
    callable of it.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(a):
        def body(i, carry):
            a, chk = carry
            flat = a.reshape(-1)
            a = flat.at[0].set(flat[0] ^ (chk & 1).astype(flat.dtype)).reshape(a.shape)
            out = fn(a)
            first = jax.tree.leaves(out)[0]
            return a, chk ^ first.reshape(-1)[0].astype(jnp.int32)

        _, chk = jax.lax.fori_loop(0, iters, body, (a, jnp.int32(0)))
        return chk

    _block(many(arg))  # compile + warm (host fetch: see _block's caveat)
    times = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        _block(many(arg))
        times.append((_time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


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
