"""Encode-pipeline stage attribution on the chip.

Times each fused-encoder stage separately (gather, offsets, pack scatter,
interleave) with data-dependent amortized repeats, to find where
encode_device's wall time goes.

Usage: python scripts/perf_encode.py [size_mb]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(jax, jnp, fn, arg, iters=40):
    # iters must stay >= ~30: the one tunneled dispatch costs ~60 ms and is
    # divided by iters — at iters=5 every number carries a ~12 ms floor
    # (this skewed the round-1 per-stage encode numbers).
    from huffman_tpu.utils.timing import amortized_time_fn

    return amortized_time_fn(fn, arg, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.ops import encode as enc
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.ops.device_codebook import device_code_lengths
    from huffman_tpu.ops.device_interleave import build_streams_device
    from huffman_tpu.ops.tables import device_tables
    from huffman_tpu.utils.benchmark import silesia_like

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = 512
    data = silesia_like(size_mb << 20, seed=7)
    nbytes = data.size
    symbols = data[: nbytes & ~1].view("<u2").astype(np.int32)
    n_pairs = symbols.size
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES

    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols
    sym2 = jnp.asarray(padded).reshape(n_lanes, B)
    valid = (jnp.arange(n_lanes * B, dtype=jnp.int32) < n_pairs).reshape(n_lanes, B)

    def rec(name, sec):
        print(f"{name:28s} {sec*1e3:9.3f} ms   {nbytes/sec/1e9:7.3f} GB/s")

    rec("hist+codebook", timed(jax, jnp, lambda a: device_code_lengths(
        jnp.zeros(MAX_SYMBOLS, jnp.int32).at[a.reshape(-1)].add(1)), sym2, 30))

    codes, lens = enc.gather_codes(sym2, t.enc_codes, t.enc_lens, valid)
    rec("gather_codes", timed(jax, jnp, lambda a: enc.gather_codes(
        a, t.enc_codes, t.enc_lens, valid), sym2, 40))
    offsets, bits = enc.block_offsets(lens)
    rec("block_offsets", timed(jax, jnp, lambda a: enc.block_offsets(a), lens, 40))

    W = B  # fused worst case
    rec("pack_blocks W=B", timed(jax, jnp, lambda a: enc.pack_blocks(
        a, lens, offsets, W), codes, 30))
    Wt = 64
    while Wt * 32 < int(np.asarray(bits).max()):
        Wt <<= 1
    rec(f"pack_blocks W={Wt}", timed(jax, jnp, lambda a: enc.pack_blocks(
        a, lens, offsets, Wt), codes, 30))

    slab = enc.pack_blocks(codes, lens, offsets, Wt)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = jnp.where(valid, lens, min_len).astype(jnp.int32)
    rec("interleave (cap=B*1024)", timed(jax, jnp, lambda a: build_streams_device(
        a, eff, jnp.int32(n_real), words_cap=B * pd.GROUP_LANES)[0], slab, 3))
    cap = (int(np.asarray(bits).sum()) // 32 // max(n_lanes // pd.GROUP_LANES, 1) + 4096)
    cap = (cap + 127) // 128 * 128
    rec(f"interleave (cap={cap})", timed(jax, jnp, lambda a: build_streams_device(
        a, eff, jnp.int32(n_real), words_cap=cap)[0], slab, 3))


if __name__ == "__main__":
    main()
