"""Probe the in-kernel-translate vs rank+pair-pass boundary (r5).

The r4b re-tiering set GATHER_MAX_ALPHABET=4096 on the theory that tiny
symtabs (1-16 rows) ride the serial chain "near-free" while the separate
pair-translate pass pays a ~2x-payload DMA floor. The r5 silesia A/B
falsified that at ~4k unique (rank 12.08 vs translate 10.68 GB/s,
perflogs/r5_rank_vs_translate_silesia.log): even a 16-row on-chain
gather costs more serial latency than the pass's pipelined floor. This
sweeps the alphabet axis to locate the real crossover.

Both variants are bit-checked against the corpus before timing.

Usage: python scripts/exp_rank_boundary.py [size_mb] [alphabets_csv]
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("HTPU_COMPILE_CACHE", "/root/repo/.jit_cache")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.utils.benchmark import zipf_pairs
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    alphabets = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2 else (300, 1000, 2000, 4000)
    )
    B = 512
    iters = 80

    for A in alphabets:
        rng = np.random.default_rng(17)
        data = zipf_pairs(size_mb << 20, A, rng)
        symbols = data.view("<u2").astype(np.int32)
        n_pairs = symbols.size
        n_real = (n_pairs + B - 1) // B
        n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
        ngroups = n_lanes // pd.GROUP_LANES

        t0 = time.perf_counter()
        cache = pathlib.Path(f"/tmp/rank_boundary_{size_mb}_{A}.npz")
        cb = Codebook.from_frequencies(
            np.bincount(symbols, minlength=MAX_SYMBOLS)
        )
        min_len = int(cb.lengths[cb.lengths > 0].min())
        if cache.exists():
            stacked = np.load(cache)["stacked"]
        else:
            slab, _, lens = bf._encode_slab_numpy(
                symbols.astype(np.uint16), cb, n_lanes, B
            )
            eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
            streams = il.build_streams(slab, eff, n_real)
            stacked, _ = il.pad_streams(streams)
            np.savez(cache, stacked=stacked)
        rows_per = stacked.shape[0] // ngroups

        meta = np.zeros((ngroups, 4), dtype=np.int32)
        for g in range(ngroups):
            meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))
        symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
        assert translate, f"A={A} exceeded GATHER_MAX_ALPHABET"
        args = (
            jnp.asarray(stacked),
            jnp.asarray(cb.lj_limit),
            jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray(meta),
        )
        symtab_d = jnp.asarray(symtab)
        dummy_d = jnp.asarray(np.zeros(pd.LANES, np.int32))
        so_d = jnp.asarray(cb.sym_order.astype(np.int32))
        print(
            f"A={A}: prep {time.perf_counter()-t0:.1f}s ngroups={ngroups} "
            f"sym_rows={sym_rows} max_len={cb.max_len} min_len={min_len}",
            flush=True,
        )

        def run_translate(s):
            return pd.decode_groups(
                s, args[1], args[2], symtab_d, args[3], B, rows_per,
                sym_rows, max_len=max(cb.max_len, 1), translate=True,
                min_len=min_len, packed_out=True,
            )

        def run_rank(s):
            return pd.decode_groups(
                s, args[1], args[2], dummy_d, args[3], B, rows_per, 1,
                max_len=max(cb.max_len, 1), translate=False,
                min_len=min_len, packed_out=True, sym_order_dev=so_d,
            )

        for name, fn in (("translate(m3)", run_translate),
                         ("rank+pass(m4)", run_rank)):
            out = np.asarray(fn(args[0]))
            dec = (
                out.reshape(-1, B // 2, 8, 128)[:ngroups]
                .transpose(0, 2, 3, 1)
                .astype(np.uint32, order="C")
                .view("<u2").reshape(-1)[:n_pairs].astype(np.int64)
            )
            assert np.array_equal(dec, symbols), f"A={A} {name} WRONG"
            sec = amortized_time_fn(fn, args[0], iters=iters)
            print(
                f"A={A:5d} {name}: {sec*1e3:7.3f} ms  "
                f"{n_pairs*2/sec/1e9:6.2f} GB/s", flush=True,
            )


if __name__ == "__main__":
    main()
