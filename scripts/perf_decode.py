"""Decode-kernel perf iteration harness (not part of the library).

Builds an encoded stream set once (native interleave build), then times
kernel variants with the amortized in-jit repeat method from bench.py.

Usage: python scripts/perf_decode.py [size_mb] [alphabet] [multi] [iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()  # exclusive chip use (see utils/chiplock.py)

    import jax
    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    alphabet_size = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    multi = int(sys.argv[3]) if len(sys.argv) > 3 else pd.DEFAULT_MULTI
    # The ~60 ms tunneled dispatch divides by iters: at 20 a ~3 ms/iter
    # decode reads ~2x slow (the round-1 mistake; CLAUDE.md). 80 matches
    # bench.py and the K>=80 ablation methodology.
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 80
    B = 512

    rng = np.random.default_rng(7)
    alphabet = rng.choice(MAX_SYMBOLS, size=alphabet_size, replace=False)
    p = 1.0 / np.arange(1, alphabet_size + 1) ** 1.1
    p /= p.sum()
    n_pairs = (size_mb << 20) // 2
    symbols = rng.choice(alphabet, size=n_pairs, p=p).astype(np.int32)

    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    ngroups = n_lanes // pd.GROUP_LANES

    t0 = time.perf_counter()
    import pathlib

    cache = pathlib.Path(f"/tmp/perf_decode_{size_mb}_{alphabet_size}.npz")
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    min_len = int(cb.lengths[cb.lengths > 0].min())
    if cache.exists():
        stacked = np.load(cache)["stacked"]
    else:
        slab, _, lens = bf._encode_slab_numpy(symbols.astype(np.uint16), cb, n_lanes, B)
        eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
        streams = il.build_streams(slab, eff, n_real)
        stacked, _ = il.pad_streams(streams)
        np.savez(cache, stacked=stacked)
    rows_per = stacked.shape[0] // ngroups
    print(
        f"prep {time.perf_counter()-t0:.1f}s  ngroups={ngroups} rows/group={rows_per} "
        f"max_len={cb.max_len} n_unique={cb.n_unique} min_len={min_len}"
    )

    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))

    s_dev = jnp.asarray(stacked)
    args = (
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab),
        jnp.asarray(meta),
    )

    # COMPLETE decode, matching bench.py: packed 16-bit pair output; rank
    # tiers translate the packed rank pairs in-program
    # (gather_u16_pairs_pallas, r4).
    sym_order_dev = (
        None if translate else jnp.asarray(cb.sym_order.astype(np.int32))
    )

    def decode_fn(s):
        return pd.decode_groups(
            s, *args, B, rows_per, sym_rows,
            max_len=max(cb.max_len, 1), translate=translate, multi=multi,
            min_len=min_len, packed_out=True, sym_order_dev=sym_order_dev,
        )

    # correctness (skipped under ablation — output is wrong by design)
    import os as _os

    if not _os.environ.get("HTPU_ABLATE"):
        out = np.asarray(decode_fn(s_dev))
        dec = (
            out.reshape(ngroups, B // 2, 8, 128)
            .transpose(0, 2, 3, 1)
            .astype(np.uint32)
            .copy(order="C")
            .view("<u2")
            .reshape(-1)[:n_pairs]
            .astype(np.int64)
        )
        assert np.array_equal(dec, symbols), "decode mismatch"

    from huffman_tpu.utils.timing import amortized_time_fn

    sec = amortized_time_fn(decode_fn, s_dev, iters=iters)
    print(
        f"decode: {sec*1e3:.3f} ms/iter  {n_pairs*2/sec/1e9:.2f} GB/s  "
        f"({sec/ (ngroups*B) *1e9*multi:.0f} ns/step, translate={translate}, "
        f"multi={multi}, iters={iters})"
    )


if __name__ == "__main__":
    main()
