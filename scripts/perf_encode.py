"""Encode-pipeline stage attribution on the chip.

Times each fused-encoder stage separately with amortized in-jit repeats
(iters >= 30 — the ~60 ms tunneled dispatch divides by iters; iters=5 left
a ~12 ms floor under every round-1 number).

Stages (the fused pipeline, ops/fused.py): Pallas MXU histogram -> capped
package-merge codebook -> rank-select gather -> Pallas pack + scatter
deposit; plus the legacy XLA formulations for comparison.

Usage: python scripts/perf_encode.py [size_mb]
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

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import GROUP_LANES, MAX_SYMBOLS
    from huffman_tpu.ops import encode as enc
    from huffman_tpu.ops import pallas_encode as pe
    from huffman_tpu.ops import pallas_gather as pg
    from huffman_tpu.ops.device_codebook import device_code_lengths
    from huffman_tpu.ops.fused import encode_device
    from huffman_tpu.ops.histogram import histogram_matmul
    from huffman_tpu.ops.pallas_hist import histogram_pallas
    from huffman_tpu.ops.tables import device_tables
    from huffman_tpu.utils.benchmark import silesia_like
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = 512
    data = silesia_like(size_mb << 20, seed=7)
    nbytes = data.size
    symbols = data[: nbytes & ~1].view("<u2").astype(np.int32)
    n_pairs = symbols.size
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES

    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    cb = Codebook.from_frequencies(freqs)
    t = device_tables(cb)
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols
    sym_flat = jax.device_put(jnp.asarray(symbols))
    sym2 = jax.device_put(jnp.asarray(padded).reshape(n_lanes, B))
    pad_dev = jax.device_put(jnp.asarray(padded))
    valid = (jnp.arange(n_lanes * B, dtype=jnp.int32) < n_pairs).reshape(n_lanes, B)
    hist_dev = jax.device_put(jnp.asarray(freqs.astype(np.int32)))

    def rec(name, sec):
        print(f"{name:36s} {sec*1e3:9.3f} ms   {nbytes/sec/1e9:7.3f} GB/s",
              flush=True)

    rec("histogram (Pallas MXU)",
        amortized_time_fn(histogram_pallas, sym_flat, 40))
    rec("histogram (XLA matmul c=4096)",
        amortized_time_fn(functools.partial(histogram_matmul, chunk=4096),
                          sym_flat, 30))
    rec("codebook package-merge (full)",
        amortized_time_fn(functools.partial(device_code_lengths, max_len=18),
                          hist_dev, 20))
    rec("codebook package-merge (K=8192)",
        amortized_time_fn(
            functools.partial(device_code_lengths, max_len=18,
                              alphabet_cap=8192),
            hist_dev, 30))

    enc_packed_np = (cb.lengths.astype(np.uint32) << 26) | cb.codes.astype(np.uint32)
    mw, cm, dn, ok = pg.build_rank_select(enc_packed_np, cb.lengths > 0)
    assert ok
    mw, cm, dn = map(lambda a: jax.device_put(jnp.asarray(a)), (mw, cm, dn))
    rec("gather rank-select (Pallas)",
        amortized_time_fn(lambda a: pg.gather_rank_select(a, mw, cm, dn),
                          sym_flat, 40))
    r = pg.build_displacement_table(enc_packed_np, cb.lengths > 0)
    if r is not None:
        disp, table = map(lambda a: jax.device_put(jnp.asarray(a)), r)
        rec("gather displacement (Pallas)",
            amortized_time_fn(lambda a: pg.gather_table_pallas(a, disp, table),
                              sym_flat, 40))
    enc_packed = jax.device_put(jnp.asarray(enc_packed_np))
    rec("gather (XLA per-element)",
        amortized_time_fn(
            lambda a: enc.gather_codes_packed(a, enc_packed, valid)[0],
            sym2, 20))

    codes, lens = enc.gather_codes_packed(sym2, enc_packed, valid)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = jnp.where(valid, lens, min_len).astype(jnp.int32)
    bits = np.asarray(jnp.sum(eff.reshape(-1, GROUP_LANES, B), axis=(1, 2)))
    cap = (int(bits.max() // 32) + 4096 + 8191) // 8192 * 8192
    codes = jax.device_put(codes)
    eff = jax.device_put(eff)
    rec(f"pack+deposit (scatter, cap={cap})",
        amortized_time_fn(
            lambda a: pe.pack_streams_pallas(
                a, eff, jnp.int32(n_real), words_cap=cap)[0],
            codes, 30))
    rec("pack+deposit (kernel deposit)",
        amortized_time_fn(
            lambda a: pe.pack_streams_kernel_deposit(
                a, eff, jnp.int32(n_real), words_cap=cap)[0],
            codes, 30))
    for m in (2, 3):
        rec(f"pack+deposit (scatter, multi={m})",
            amortized_time_fn(
                lambda a, m=m: pe.pack_streams_pallas(
                    a, eff, jnp.int32(n_real), words_cap=cap,
                    staging_multi=m)[0],
                codes, 30))

    npairs_dev = jnp.asarray(n_pairs, jnp.int32)
    rec("FUSED fast tier (tight cap)",
        amortized_time_fn(
            lambda a: encode_device(a, npairs_dev, B, words_cap=cap,
                                    max_len=18)["streams"],
            pad_dev, 30))
    rec("FUSED xla tier (tight cap)",
        amortized_time_fn(
            lambda a: encode_device(a, npairs_dev, B, words_cap=cap,
                                    max_len=18, gather="xla",
                                    alphabet_cap=None)["streams"],
            pad_dev, 20))


if __name__ == "__main__":
    main()
