"""CPU smoke harness for the chip-only perf scripts (no timing value).

The gated measurement batch (scripts/gated_batch.sh) runs perf scripts
that have no CPU path (real pallas_call does not lower on the CPU
backend), so a Python-level bug in a script would silently eat its one
shot at the shared chip. This harness forces every pallas_call into
interpret mode, shrinks the amortized-timing iteration counts, and runs
each script end-to-end at a tiny size — flushing trace-time and
harness-level errors without hardware. Numbers printed here are
meaningless; ONLY the absence of a traceback matters.

Usage: python scripts/smoke_cpu.py [script ...]   (default: all queued)
"""

import os
import sys

sys.path.insert(0, ".")

# Env var as well as the config update: utils.chiplock keys off the env
# var, and a smoke run must never queue behind the real chip lock.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl

_orig_pallas_call = pl.pallas_call


def _interp_pallas_call(*a, **kw):
    kw["interpret"] = True
    return _orig_pallas_call(*a, **kw)


pl.pallas_call = _interp_pallas_call

import huffman_tpu.utils.timing as timing

_orig_amortized = timing.amortized_time_fn


def _fast_amortized(fn, arg, iters: int = 20, reps: int = 3) -> float:
    return _orig_amortized(fn, arg, iters=2, reps=1)


timing.amortized_time_fn = _fast_amortized


def run(script: str, argv: list[str]) -> None:
    print(f"=== smoke {script} {argv} ===", flush=True)
    src = open(script).read()
    sys.argv = [script] + argv
    glb = {"__name__": "__main__", "__file__": script}
    exec(compile(src, script, "exec"), glb)


DEFAULT = [
    ("scripts/perf_hist.py", ["1"]),
    ("scripts/perf_encode.py", ["1"]),
    ("scripts/perf_tiers.py", ["1"]),
    ("scripts/perf_decode.py", ["1", "3000", "3"]),
    ("scripts/bench_all.py", ["1"]),
]

if __name__ == "__main__":
    if len(sys.argv) > 1:
        # Each job is "path/to/script.py[:arg1,arg2,...]".
        jobs = []
        for spec in sys.argv[1:]:
            script, _, argstr = spec.partition(":")
            jobs.append((script, argstr.split(",") if argstr else []))
    else:
        jobs = DEFAULT
    for script, argv in jobs:
        run(script, argv)
    print("SMOKE OK")
