"""Rank-select gather per_cell sweep at the WIDE dense-table caps.

The wide-alphabet fused encode's largest stage after round 4 is the
rank-select dense gather (RESULTS: 6.34 ms / 16 MiB at cap 32768,
11.28 at 65536 — the select tree is linear in dense-table rows). The
grid-cell size (tiles per cell) trades pipeline startup against block
size; the decoder's pair-gather sweep showed a measurable spread
(per_cell 32/64/128/256 = 2.50/2.48/2.78/2.64 ms on a 120-row table).
This sweeps the same knob on the encode-side gather at each ladder cap,
bit-checked against the numpy twin before timing.

Usage: python scripts/exp_rank_gather.py [size_mb]
"""

import functools
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.ops.pallas_gather import (
        build_rank_select, gather_rank_select,
    )
    from huffman_tpu.utils.benchmark import zipf_pairs
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(11)

    for n_unique, cap in ((30000, 32768), (60000, 65536), (3900, 4096)):
        data = zipf_pairs(size_mb << 20, n_unique, rng)
        symbols = data.view("<u2").astype(np.int32)
        present = np.zeros(65536, bool)
        present[np.unique(symbols)] = True
        values = (np.arange(65536, dtype=np.uint32) * 2654435761) & 0xFFFFFFFF
        maskw, cums, dense, ok = build_rank_select(values, present, cap=cap)
        assert ok
        want = values[symbols]
        sym_dev, maskw_d, cums_d, dense_d = (
            jax.device_put(jnp.asarray(a))
            for a in (symbols, maskw, cums, dense)
        )

        for per_cell in (16, 32, 64, 128, 256):
            fn = functools.partial(
                gather_rank_select, maskwords=maskw_d, cums=cums_d,
                dense=dense_d, per_cell=per_cell,
            )
            name = f"cap={cap:5d} n={n_unique:5d} per_cell={per_cell:3d}"
            try:
                got = np.asarray(fn(sym_dev))
                assert np.array_equal(got, want), f"{name} WRONG"
                sec = amortized_time_fn(fn, sym_dev, iters=40)
                gbps = symbols.size * 2 / sec / 1e9
                print(f"{name}: {sec * 1e3:7.3f} ms  {gbps:6.2f} GB/s",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                traceback.print_exc(limit=2, file=sys.stderr)


if __name__ == "__main__":
    main()
