"""Histogram kernel variant shootout (encode stretch; VERDICT r2 #3b,
r3 weak #1).

The shipping kernel (ops/pallas_hist.py) builds (256, C) transposed hi/lo
one-hots by iota compare, casts to int8, and accumulates the
(256,C)x(256,C)->(256,256) int8 lane-contraction on the MXU. CLAUDE.md
parks "one-hot construction is the VPU floor (~512 compare-ops/symbol);
narrower compares or bigger grid cells might shave ~2x". Variants are
measured THROUGH the shipping entry point (histogram_pallas(cell=,
cmp_dtype=)), amortized in-jit (K>=30), bit-checked before timing.

Every variant runs inside try/except: round 3's int8-compare variant
failed Mosaic compile on the v5e and its crash aborted the whole sweep
before the cell-width variants were measured (VERDICT r3 weak #1) — a
failing variant must cost one FAIL line, not the harness.

Usage: python scripts/perf_hist.py [size_mb]
"""

import functools
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()  # exclusive chip use (see utils/chiplock.py)

    import jax
    import jax.numpy as jnp

    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.ops.pallas_hist import histogram_pallas
    from huffman_tpu.utils.benchmark import silesia_like
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    data = silesia_like(size_mb << 20, seed=7)
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    # size to a multiple of every cell width under test
    n = symbols.size // 16384 * 16384
    symbols = symbols[:n]
    want = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    sym_dev = jax.device_put(jnp.asarray(symbols))

    timings = {}

    def rec(name, fn, iters=40):
        try:
            got = np.asarray(fn(sym_dev)).reshape(-1)
            assert np.array_equal(got, want), f"{name} WRONG"
            sec = amortized_time_fn(fn, sym_dev, iters)
        except Exception as e:  # compile failures must not eat the sweep
            print(f"{name:40s}     FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            traceback.print_exc(limit=2, file=sys.stderr)
            return
        timings[name] = sec
        print(f"{name:40s} {sec*1e3:8.3f} ms   "
              f"{n*2/sec/1e9:6.2f} GB/s", flush=True)

    # argv[2]: comma-separated cell list; argv[3]: cmp dtypes. Defaults
    # keep the historical grid; the r5 probe extends cells upward
    # (32768/65536, int32 only — per-symbol compare count is C-invariant,
    # wider cells only amortize grid overhead, r4b trend 5.16/5.01/4.89).
    cells = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2 else (4096, 8192, 16384)
    )
    dtypes = (
        tuple(sys.argv[3].split(","))
        if len(sys.argv) > 3
        else ("int32", "int16", "int8", "int16_arith", "int8_arith")
    )
    for cell in cells:
        for cmp_dtype in dtypes:
            rec(f"C={cell} cmp={cmp_dtype}",
                functools.partial(histogram_pallas, cell=cell,
                                  cmp_dtype=cmp_dtype))
    rec("default", histogram_pallas)
    # Tuned-default audit (VERDICT r4 #6): the shipping default must sit
    # within noise of the sweep's best surviving variant.
    if "default" in timings and len(timings) > 1:
        best = min((k for k in timings if k != "default"), key=timings.get)
        d, b = timings["default"], timings[best]
        verdict = "OK" if d <= b * 1.05 else "STALE"
        print(f"DEFAULT_{verdict}: default {d*1e3:.3f} ms vs best "
              f"{b*1e3:.3f} ({best})", flush=True)


if __name__ == "__main__":
    main()
