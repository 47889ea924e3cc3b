"""Round-4 experiment: split the wide-alphabet (rank-tier) decode wall.

The wide30k headline is kernel + pair-translate in one jit (3.41 ms /
16 MiB = 4.93 GB/s). This measures the two pieces separately and sweeps
the remaining knobs:

  1. rank-mode decode kernel ONLY (pair translate patched to identity),
     multi sweep
  2. gather_u16_pairs_pallas standalone: per_cell x table-rows sweep
  3. full path at the best combination

Usage: python scripts/exp_wide_decode.py [size_mb] [alphabet] [iters] [B]

``B`` (block symbols, default 512) probes the r5 small-payload
steady-state question (VERDICT r4 #3): the kernel grid is one cell per
``multi`` groups and ngroups = n_pairs / (B * 1024), so at 16 MiB / B=512
only 4 cells exist and the kernel never pipelines against the translate
pass. Halving B doubles the cells at ~2 % container-size cost (one 8 KiB
preload region per extra group).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.ops import pallas_gather as pg
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    alphabet_size = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 512

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
    cache = pathlib.Path(
        f"/tmp/perf_decode_{size_mb}_{alphabet_size}"
        + (f"_B{B}" if B != 512 else "") + ".npz"
    )
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
        f"prep {time.perf_counter()-t0:.1f}s ngroups={ngroups} "
        f"rows/group={rows_per} max_len={cb.max_len} min_len={min_len}",
        flush=True,
    )

    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    assert not translate, "experiment expects the rank tier"
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
    sym_order_dev = jnp.asarray(cb.sym_order.astype(np.int32))
    nbytes = n_pairs * 2

    def full_fn(multi, per_cell=None):
        if per_cell is not None:
            orig = pg.gather_u16_pairs_pallas

            def patched(packed_idx, packed16, interpret=False):
                return orig(packed_idx, packed16, interpret, per_cell=per_cell)

            pg.gather_u16_pairs_pallas = patched

        def fn(s):
            return pd.decode_groups(
                s, *args, B, rows_per, sym_rows,
                max_len=max(cb.max_len, 1), translate=False, multi=multi,
                min_len=min_len, packed_out=True, sym_order_dev=sym_order_dev,
            )

        return fn

    orig_pairs = pg.gather_u16_pairs_pallas

    # --- 1. kernel only: identity-patch the translate pass -------------
    for multi in (4,):
        pg.gather_u16_pairs_pallas = lambda packed_idx, packed16, interpret=False: packed_idx
        jax.clear_caches()
        fn = full_fn(multi)
        sec = amortized_time_fn(fn, s_dev, iters=iters)
        print(
            f"kernel-only multi={multi}: {sec*1e3:.3f} ms "
            f"({nbytes/sec/1e9:.2f} GB/s)",
            flush=True,
        )
    pg.gather_u16_pairs_pallas = orig_pairs
    jax.clear_caches()

    # --- 2. standalone pair gather: per_cell x rows --------------------
    # Real rank words from one decode (identity translate), reshaped to
    # the translate pass's actual input shape.
    pg.gather_u16_pairs_pallas = lambda packed_idx, packed16, interpret=False: packed_idx
    jax.clear_caches()
    ranks_packed = jnp.asarray(np.asarray(full_fn(4)(s_dev)))
    pg.gather_u16_pairs_pallas = orig_pairs
    jax.clear_caches()

    n = int(sym_order_dev.shape[0])
    so = np.asarray(sym_order_dev).astype(np.uint32)
    for rows in (pd._pack_rows_for(n), (((n + 1) // 2) + 127) // 128):
        even = np.zeros((rows * 128,), np.uint32)
        odd = np.zeros((rows * 128,), np.uint32)
        even[: (n + 1) // 2] = so[0::2]
        odd[: n // 2] = so[1::2]
        table = jnp.asarray((even | (odd << 16)).view(np.int32))
        for per_cell in (32, 64):
            fn = lambda x, t=table, p=per_cell: pg.gather_u16_pairs_pallas(
                x, t, per_cell=p
            )
            sec = amortized_time_fn(fn, ranks_packed, iters=iters)
            print(
                f"pair-gather rows={rows} per_cell={per_cell}: "
                f"{sec*1e3:.3f} ms ({nbytes/sec/1e9:.2f} GB/s-of-output)",
                flush=True,
            )

    # --- 3. full path at candidate combos -------------------------------
    for multi in (4,):
        for per_cell in (32, 64):
            jax.clear_caches()
            fn = full_fn(multi, per_cell)
            out = np.asarray(fn(s_dev))
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
            sec = amortized_time_fn(fn, s_dev, iters=iters)
            print(
                f"full multi={multi} per_cell={per_cell}: {sec*1e3:.3f} ms "
                f"({nbytes/sec/1e9:.2f} GB/s)",
                flush=True,
            )
            pg.gather_u16_pairs_pallas = orig_pairs


if __name__ == "__main__":
    main()
