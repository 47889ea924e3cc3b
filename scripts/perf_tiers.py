"""Alphabet-tier perf attribution on the chip (r3).

Measures, with amortized in-jit repeats (K>=30; see CLAUDE.md):
  - the package-merge codebook at each tier cap (Pallas kernel vs XLA);
  - the fused encoder end-to-end at alphabets landing in each tier
    (the VERDICT r2 wide-alphabet target: >= 1 GB/s at a 30k alphabet).

Usage: python scripts/perf_tiers.py [size_mb]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def corpus(kind: str, nbytes: int, rng):
    from huffman_tpu.utils.benchmark import silesia_like

    if kind == "silesia":  # ~3k unique pairs
        return silesia_like(nbytes, seed=7)
    from huffman_tpu.utils.benchmark import zipf_pairs

    n = {"wide12k": 12000, "wide30k": 30000, "wide60k": 60000}[kind]
    return zipf_pairs(nbytes, n, rng)


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()  # exclusive chip use (see utils/chiplock.py)

    import jax
    import jax.numpy as jnp

    from huffman_tpu.constants import GROUP_LANES, MAX_SYMBOLS
    from huffman_tpu.ops.device_codebook import device_code_lengths
    from huffman_tpu.ops.fused import encode_device
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nbytes = size_mb << 20
    B = 512
    rng = np.random.default_rng(3)

    def rec(name, sec, data_bytes=None):
        line = f"{name:44s} {sec*1e3:9.3f} ms"
        if data_bytes:
            line += f"   {data_bytes/sec/1e9:7.3f} GB/s"
        print(line, flush=True)

    # -- codebook at each cap (silesia histogram; cap sets the cost) ------
    data = corpus("silesia", nbytes, rng)
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    hist_dev = jax.device_put(jnp.asarray(freqs))
    for cap in (4096, 8192, 16384, 32768, 65536, None):
        for tag, kern in (("xla", False), ("kern", True)):
            rec(f"codebook package-merge cap={cap} {tag}",
                amortized_time_fn(
                    functools.partial(device_code_lengths, max_len=18,
                                      alphabet_cap=cap, use_kernel=kern),
                    hist_dev, 40))

    # -- wide-tier stage attribution (r4): where the non-codebook time
    # goes at the top rungs — canonical tables, rank-select build, and
    # the rank-select gather all size by the tier cap ---------------------
    from huffman_tpu.ops import pallas_gather as pg
    from huffman_tpu.ops.device_codebook import device_canonical_tables
    from huffman_tpu.ops.pallas_hist import histogram_pallas

    data = corpus("wide30k", nbytes, rng)
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    wfreqs = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    whist = jax.device_put(jnp.asarray(wfreqs))
    wsym = jax.device_put(jnp.asarray(symbols))
    nb = symbols.size * 2
    rec("wide30k histogram (Pallas)",
        amortized_time_fn(histogram_pallas, wsym, 40), nb)
    lengths = device_code_lengths(whist, max_len=18)
    rec("wide30k canonical tables",
        amortized_time_fn(device_canonical_tables, lengths, 40))
    enc_codes, enc_lens, *_ = device_canonical_tables(lengths)
    enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
    for cap in (32768, 65536):
        def build(h, cap=cap):
            return pg.build_rank_select(enc_packed, h > 0, cap=cap)[2]
        rec(f"wide30k rank-select build cap={cap}",
            amortized_time_fn(build, whist, 40))
        mw, cm, dn, ok = pg.build_rank_select(
            enc_packed, jnp.asarray(wfreqs > 0), cap=cap
        )
        assert bool(ok)
        rec(f"wide30k rank-select gather cap={cap}",
            amortized_time_fn(
                lambda a, mw=mw, cm=cm, dn=dn: pg.gather_rank_select(
                    a, mw, cm, dn
                ),
                wsym, 40), nb)

    # -- fused encoder per tier -------------------------------------------
    for kind in ("silesia", "wide12k", "wide30k", "wide60k"):
        data = corpus(kind, nbytes, rng)
        symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
        n_pairs = symbols.size
        n_real = (n_pairs + B - 1) // B
        n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
        padded = np.zeros(n_lanes * B, np.int32)
        padded[:n_pairs] = symbols
        pad_dev = jax.device_put(jnp.asarray(padded))
        np_dev = jnp.asarray(n_pairs, jnp.int32)
        nuniq = int((np.bincount(symbols, minlength=MAX_SYMBOLS) > 0).sum())

        r = encode_device(pad_dev, np_dev, B, max_len=18)
        assert bool(r["ok"]), kind
        rec(f"FUSED encode {kind} (n_unique={nuniq})",
            amortized_time_fn(
                lambda a: encode_device(a, np_dev, B, max_len=18)["streams"],
                pad_dev, 30),
            data_bytes=n_pairs * 2)


if __name__ == "__main__":
    main()
