"""Experiment: decode-chain width (sublane rows per group).

Patches the group-size constants BEFORE any tracing, rebuilds streams with
the NumPy simulation (the native builder is compiled for 1024), and times
the kernel. Fixed per-iteration overhead should amortize over wider tiles.

Usage: python scripts/exp_group_size.py <sublanes: 8|16|32> [size_mb] [multi]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SIZE_MB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MULTI = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import huffman_tpu.ops.pallas_decode as pd

pd.SUBLANES = SUB
pd.GROUP_LANES = SUB * 128
pd.WINDOW_ROWS = SUB + 1

import huffman_tpu.container.interleave as il

il.GROUP_LANES = pd.GROUP_LANES
il.WINDOW_ROWS = pd.WINDOW_ROWS


def main():
    import jax
    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf

    B = 512
    alphabet_size = 3000
    rng = np.random.default_rng(7)
    alphabet = rng.choice(MAX_SYMBOLS, size=alphabet_size, replace=False)
    p = 1.0 / np.arange(1, alphabet_size + 1) ** 1.1
    p /= p.sum()
    n_pairs = (SIZE_MB << 20) // 2
    symbols = rng.choice(alphabet, size=n_pairs, p=p).astype(np.int32)

    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    ngroups = n_lanes // pd.GROUP_LANES

    import pathlib

    cache = pathlib.Path(f"/tmp/exp_group_{SUB}_{SIZE_MB}.npz")
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    if cache.exists():
        stacked = np.load(cache)["stacked"]
    else:
        slab, _, lens = bf._encode_slab_numpy(symbols.astype(np.uint16), cb, n_lanes, B)
        min_len = int(cb.lengths[cb.lengths > 0].min())
        eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
        streams = il.build_interleaved_streams(slab, eff, n_real)  # numpy sim
        stacked, _ = il.pad_streams(streams)
        np.savez(cache, stacked=stacked)
    rows_per = stacked.shape[0] // ngroups

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

    def decode_fn(s):
        return pd.decode_groups(
            s, *args, B, rows_per, sym_rows,
            max_len=max(cb.max_len, 1), translate=translate, multi=MULTI,
        )

    out = np.asarray(decode_fn(s_dev))
    dec = (
        out.reshape(ngroups, B, SUB, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    )
    assert np.array_equal(dec, symbols), "decode mismatch"

    ITERS = 20

    @jax.jit
    def many(s):
        def body(i, carry):
            s, chk = carry
            s = s.at[-1, -1].set(chk)
            o = decode_fn(s)
            return s, jnp.bitwise_xor(chk, o[0, 0, 0].astype(jnp.uint32) & jnp.uint32(1))

        _, chk = jax.lax.fori_loop(0, ITERS, body, (s, jnp.uint32(0)))
        return chk

    many(s_dev).block_until_ready()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        many(s_dev).block_until_ready()
        reps.append((time.perf_counter() - t0) / ITERS)
    sec = sorted(reps)[1]
    print(
        f"SUB={SUB} multi={MULTI}: {sec*1e3:.3f} ms  {n_pairs*2/sec/1e9:.2f} GB/s"
    )


if __name__ == "__main__":
    main()
