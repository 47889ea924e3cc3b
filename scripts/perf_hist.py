"""Histogram kernel variant shootout (r3 encode stretch, VERDICT r2 #3b).

The shipping kernel (ops/pallas_hist.py) builds (256, C) transposed hi/lo
one-hots by iota compare, casts to int8, and accumulates the
(256,C)x(256,C)->(256,256) int8 lane-contraction on the MXU. CLAUDE.md
parks "one-hot construction is the VPU floor (~512 compare-ops/symbol);
int8 one-hots or bigger grid cells might shave ~2x". Variants measured
here THROUGH the shipping entry point (histogram_pallas(cell=, int8_cmp=)),
amortized in-jit (K>=30), bit-checked before timing:

  v0  shipping default (C=4096, int32 compares)
  v1  int8-domain compares: cast sym bytes + iota to int8 BEFORE the
      compare — the VPU packs int8 lanes 4x denser, so the 512
      compares/symbol shrink to ~128 int32-lane-equivalents
  v2  cell width C=8192 (half the grid steps, same per-symbol work)
  v3  C=8192 + int8 compares
  v4  C=16384 + int8 compares

Usage: python scripts/perf_hist.py [size_mb]
"""

import functools
import sys

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

    def rec(name, fn, iters=40):
        got = np.asarray(fn(sym_dev)).reshape(-1)
        assert np.array_equal(got, want), f"{name} WRONG"
        sec = amortized_time_fn(fn, sym_dev, iters)
        print(f"{name:40s} {sec*1e3:8.3f} ms   "
              f"{n*2/sec/1e9:6.2f} GB/s", flush=True)

    rec("v0 default C=4096 int32", histogram_pallas)
    rec("v1 C=4096 int8",
        functools.partial(histogram_pallas, int8_cmp=True))
    rec("v2 C=8192 int32",
        functools.partial(histogram_pallas, cell=8192))
    rec("v3 C=8192 int8",
        functools.partial(histogram_pallas, cell=8192, int8_cmp=True))
    rec("v4 C=16384 int8",
        functools.partial(histogram_pallas, cell=16384, int8_cmp=True))


if __name__ == "__main__":
    main()
