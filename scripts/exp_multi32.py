"""Rank-mode multi + pair-pass per_cell sweep at the SHIPPING 32 MiB.

DEFAULT_MULTI_RANK=4 was tuned at 16 MiB/30k (r4: multi 2-6 =
4.20/4.25/4.72/4.13/4.45). With the r5 boundary move the headline
silesia corpus ships rank mode too, and the 32 MiB operating point was
never swept for either corpus. Also sweeps the pair-translate per_cell
at the silesia-size table (16 rows — default_per_cell says 128 there,
extrapolated from the rank-select sweep, never measured on this pass).

Usage: python scripts/exp_multi32.py [corpus: silesia|wide30k] [size_mb]
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
    from huffman_tpu.utils.benchmark import silesia_like, zipf_pairs
    from huffman_tpu.utils.timing import amortized_time_fn

    corpus = sys.argv[1] if len(sys.argv) > 1 else "silesia"
    size_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    B = 512
    iters = 80

    rng = np.random.default_rng(7)
    if corpus == "silesia":
        data = silesia_like(size_mb << 20, seed=7)
    elif corpus == "text1k":
        # translate-mode territory (<= 1024 unique): DEFAULT_MULTI=3 was
        # tuned in r2 before exact-row symtabs and the r5 boundary move.
        a = np.random.default_rng(5).choice(65536, 900, replace=False)
        pz = 1.0 / np.arange(1, 901) ** 1.1
        pz /= pz.sum()
        data = np.random.default_rng(5).choice(
            a, (size_mb << 20) // 2, p=pz
        ).astype("<u2").view(np.uint8)
    elif corpus == "text2k":
        # 8-row symtab: translate-vs-rank boundary territory. Run with
        # HTPU_GATHER_MAX_ALPHABET=4096 to force translate mode here.
        a = np.random.default_rng(8).choice(65536, 2000, replace=False)
        pz = 1.0 / np.arange(1, 2001) ** 1.1
        pz /= pz.sum()
        data = np.random.default_rng(8).choice(
            a, (size_mb << 20) // 2, p=pz
        ).astype("<u2").view(np.uint8)
    elif corpus == "text300":
        a = np.random.default_rng(6).choice(65536, 300, replace=False)
        pz = 1.0 / np.arange(1, 301) ** 1.2
        pz /= pz.sum()
        data = np.random.default_rng(6).choice(
            a, (size_mb << 20) // 2, p=pz
        ).astype("<u2").view(np.uint8)
    elif corpus == "wide60k":
        data = zipf_pairs(size_mb << 20, 60000, np.random.default_rng(3))
    else:
        data = zipf_pairs(size_mb << 20, 30000, np.random.default_rng(3))
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    n_pairs = symbols.size
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    ngroups = n_lanes // pd.GROUP_LANES

    t0 = time.perf_counter()
    cache = pathlib.Path(f"/tmp/multi32_{corpus}_{size_mb}.npz")
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
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
    print(
        f"{corpus}: prep {time.perf_counter()-t0:.1f}s ngroups={ngroups} "
        f"n_unique={cb.n_unique} max_len={cb.max_len}", flush=True,
    )

    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))
    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    args = (
        jnp.asarray(stacked),
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab),
        jnp.asarray(meta),
    )
    so_d = None if translate else jnp.asarray(cb.sym_order.astype(np.int32))

    from huffman_tpu.ops import pallas_gather as pg
    orig_pairs = pg.gather_u16_pairs_pallas

    def run(multi, per_cell=None):
        if per_cell is not None:
            def patched(packed_idx, packed16, interpret=False,
                        per_cell=per_cell, _orig=orig_pairs):
                return _orig(packed_idx, packed16, interpret,
                             per_cell=per_cell)
            pg.gather_u16_pairs_pallas = patched
        else:
            pg.gather_u16_pairs_pallas = orig_pairs

        def fn(s):
            return pd.decode_groups(
                s, *args[1:], B, rows_per, sym_rows,
                max_len=max(cb.max_len, 1), translate=translate,
                multi=multi, min_len=min_len, packed_out=True,
                sym_order_dev=so_d,
            )
        return fn

    import jax
    first = True
    for multi, per_cell in ((3, None), (4, None), (5, None), (6, None),
                            (5, 64), (5, 128), (5, 256)):
        jax.clear_caches()
        fn = run(multi, per_cell)
        if first:
            out = np.asarray(fn(args[0]))
            dec = (
                out.reshape(-1, B // 2, 8, 128)[:ngroups]
                .transpose(0, 2, 3, 1)
                .astype(np.uint32, order="C")
                .view("<u2").reshape(-1)[:n_pairs].astype(np.int64)
            )
            assert np.array_equal(dec, symbols), "decode mismatch"
            first = False
        sec = amortized_time_fn(fn, args[0], iters=iters)
        print(
            f"{corpus} multi={multi} per_cell={str(per_cell):>4s}: "
            f"{sec*1e3:7.3f} ms  {n_pairs*2/sec/1e9:6.2f} GB/s", flush=True,
        )
    pg.gather_u16_pairs_pallas = orig_pairs


if __name__ == "__main__":
    main()
