"""Exclusive-use guard for the single shared TPU chip.

Only one process can use the TPU at a time — a second holder does not
error, it silently corrupts BOTH processes' timings (CLAUDE.md
"Environment quirks"; round 3's headline bench was captured while the
gated measurement batch held the chip, VERDICT r3 weak #5). Every
measurement entry point (bench.py, scripts/perf_*.py, chip_check.py)
calls :func:`guard_chip` before touching the backend, so overlapping
runs serialize on an advisory ``flock`` instead of sharing the chip.

The lock is per-container (``/tmp``), held for the process lifetime, and
released automatically on exit — a crashed holder cannot wedge the next
run. On timeout the caller proceeds with a loud stderr warning rather
than dying: a wedged foreign process should not take the driver's bench
down with it, but the warning makes the numbers auditable as suspect.

Every guarded process also arms a HARD RUNTIME BOUND (SIGALRM) when it
takes the lock: round 4's official benchmark record was lost because an
unbounded experiment sweep held the chip into the end-of-round snapshot
(VERDICT r4 weak #1). The lock can serialize but not cancel, so the
bound is enforced in-process — ``max_runtime_s`` (default
``HTPU_SCRIPT_TIMEOUT`` or 1500 s) hard-exits the holder, releasing the
flock. Long legitimate runs raise it explicitly; nothing can forget it.
"""

from __future__ import annotations

import fcntl
import os
import signal
import sys
import time

LOCK_PATH = os.environ.get("HTPU_CHIP_LOCK", "/tmp/htpu_chip.lock")

# Keep the fd (and thus the flock) alive for the process lifetime.
_lock_file = None


def _other_python_pids() -> list[str]:
    """Best-effort list of other live python processes (candidate stale
    chip holders that predate the lock discipline)."""
    me = os.getpid()
    out = []
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
            except OSError:
                continue
            if "python" in cmd and "grep" not in cmd:
                out.append(f"pid {pid}: {cmd.strip()[:120]}")
    except OSError:
        pass
    return out


def _arm_runtime_bound(max_runtime_s: int) -> None:
    """Hard-exit this process after ``max_runtime_s`` seconds (SIGALRM).

    Process exit releases the flock, so a forgotten sweep can never hold
    the chip into the driver's end-of-round bench again."""
    if max_runtime_s <= 0:
        return

    def _expired(signum, frame):  # pragma: no cover - timing-dependent
        print(
            f"[chiplock] HARD RUNTIME BOUND hit ({max_runtime_s}s) — "
            "exiting so the chip lock frees; partial results above stand",
            file=sys.stderr, flush=True,
        )
        os._exit(124)

    try:
        signal.signal(signal.SIGALRM, _expired)
        signal.alarm(int(max_runtime_s))
    except (ValueError, OSError):  # pragma: no cover - non-main thread
        pass


def guard_chip(timeout_s: float = 3600.0, poll_s: float = 5.0,
               max_runtime_s: int | None = None) -> bool:
    """Acquire the exclusive chip lock (blocking up to ``timeout_s``).

    Returns True when the lock is held. Returns False — after printing a
    loud warning — if the wait timed out or locking is unavailable; the
    caller proceeds either way, but timings taken without the lock must
    be treated as contamination-suspect.

    ``max_runtime_s`` arms the hard in-process runtime bound (see module
    docstring); None reads ``HTPU_SCRIPT_TIMEOUT`` (default 1500 s).

    No-op (True) when JAX is pinned to CPU via ``JAX_PLATFORMS`` — test
    and smoke runs don't touch the chip.
    """
    global _lock_file
    if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
        return True
    if max_runtime_s is None:
        max_runtime_s = int(os.environ.get("HTPU_SCRIPT_TIMEOUT", "1500"))
    if _lock_file is not None:
        return True
    try:
        f = open(LOCK_PATH, "a+")
    except OSError as e:  # pragma: no cover - /tmp unavailable
        print(f"[chiplock] WARNING: cannot open {LOCK_PATH}: {e}; "
              "proceeding UNGUARDED", file=sys.stderr, flush=True)
        _arm_runtime_bound(max_runtime_s)
        return False
    t0 = time.monotonic()
    warned = False
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            f.seek(0)
            f.truncate()
            f.write(f"{os.getpid()} {' '.join(sys.argv)[:200]}\n")
            f.flush()
            _lock_file = f
            if warned:
                print("[chiplock] lock acquired after "
                      f"{time.monotonic() - t0:.0f}s wait",
                      file=sys.stderr, flush=True)
            # Arm the bound as work begins, not during the (already
            # bounded) lock wait — a queued script keeps its full budget.
            _arm_runtime_bound(max_runtime_s)
            return True
        except OSError:
            if not warned:
                try:
                    f.seek(0)
                    holder = f.read().strip()
                except OSError:
                    holder = "?"
                print(f"[chiplock] chip busy (held by: {holder}); waiting "
                      f"up to {timeout_s:.0f}s so timings don't interleave",
                      file=sys.stderr, flush=True)
                others = _other_python_pids()
                if others:
                    print("[chiplock] other python processes alive:\n  "
                          + "\n  ".join(others), file=sys.stderr, flush=True)
                warned = True
            if time.monotonic() - t0 > timeout_s:
                print("[chiplock] WARNING: wait timed out; proceeding "
                      "UNGUARDED — treat these numbers as suspect",
                      file=sys.stderr, flush=True)
                _arm_runtime_bound(max_runtime_s)
                return False
            time.sleep(poll_s)
