"""Histogram kernel variant shootout (r3 encode stretch, VERDICT r2 #3b).

The shipping kernel (ops/pallas_hist.py) builds (256, C) transposed hi/lo
one-hots by int32-iota compare, casts to int8, and accumulates the
(256,C)x(256,C)->(256,256) int8 lane-contraction on the MXU. CLAUDE.md
parks "one-hot construction is the VPU floor (~512 compare-ops/symbol);
int8 one-hots or bigger grid cells might shave ~2x". Variants measured
here, amortized in-jit (K>=30):

  v0  shipping kernel (baseline)
  v1  int8-domain compares: cast sym bytes + iota to int8 BEFORE the
      compare — if Mosaic packs int8 ALU 4x denser, the 512
      compares/symbol shrink to ~128 int32-lane-equivalents
  v2  cell width C=8192 (half the grid steps, same per-symbol work)
  v3  C=8192 + int8 compares

Usage: python scripts/perf_hist.py [size_mb]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def _variant_kernel(sym_ref, out_ref, acc_ref, *, cells: int, C: int,
                    int8_cmp: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sym = sym_ref[:].reshape(1, C)
    if int8_cmp:
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0).astype(jnp.int8)
        hi = jnp.broadcast_to((sym >> 8).astype(jnp.int8), (256, C)) == ids
        lo = jnp.broadcast_to((sym & 0xFF).astype(jnp.int8), (256, C)) == ids
    else:
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0)
        hi = jnp.broadcast_to(sym >> 8, (256, C)) == ids
        lo = jnp.broadcast_to(sym & 0xFF, (256, C)) == ids
    acc_ref[:] += jax.lax.dot_general(
        hi.astype(jnp.int8), lo.astype(jnp.int8),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    )

    @pl.when(g == cells - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _variant(symbols, *, C: int, int8_cmp: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from huffman_tpu.ops.pallas_decode import LANES

    flat = symbols.reshape(-1)
    cells = flat.shape[0] // C
    grid_sym = flat.reshape(cells * (C // LANES), LANES)
    kernel = functools.partial(
        _variant_kernel, cells=cells, C=C, int8_cmp=int8_cmp
    )
    return pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[pl.BlockSpec((C // LANES, LANES), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((256, 256), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.int32)],
    )(grid_sym)


def main():
    import jax
    import jax.numpy as jnp

    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.ops.pallas_hist import histogram_pallas
    from huffman_tpu.utils.benchmark import silesia_like
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    data = silesia_like(size_mb << 20, seed=7)
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    want = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    # size to a multiple of every cell width under test
    n = symbols.size // 16384 * 16384
    symbols = symbols[:n]
    want = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    sym_dev = jax.device_put(jnp.asarray(symbols))

    def check(fn, name):
        got = np.asarray(fn(sym_dev)).reshape(-1)
        assert np.array_equal(got, want), f"{name} WRONG"

    def rec(name, fn, iters=40):
        check(fn, name)
        sec = amortized_time_fn(fn, sym_dev, iters)
        print(f"{name:40s} {sec*1e3:8.3f} ms   "
              f"{n*2/sec/1e9:6.2f} GB/s", flush=True)

    rec("v0 shipping histogram_pallas", histogram_pallas)
    rec("v1 int8 compares C=4096",
        functools.partial(_variant, C=4096, int8_cmp=True))
    rec("v2 int32 compares C=8192",
        functools.partial(_variant, C=8192, int8_cmp=False))
    rec("v3 int8 compares C=8192",
        functools.partial(_variant, C=8192, int8_cmp=True))
    rec("v4 int8 compares C=16384",
        functools.partial(_variant, C=16384, int8_cmp=True))


if __name__ == "__main__":
    main()
