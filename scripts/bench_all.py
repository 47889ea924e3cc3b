"""Full-stage benchmark breakdown (per-stage GB/s on the local chip plus
host-runtime throughput and format ratios). bench.py remains the one-line
headline for the driver; this is the engineer-facing mirror of the
reference's per-stage instrumentation (SURVEY.md §5).

Usage: python scripts/bench_all.py [size_mb]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _time_amortized(jax, jnp, fn, arg, iters):
    # Keep iters >= ~30 for sub-10ms ops: the single tunneled dispatch is
    # ~60 ms and divides by iters (iters=5 adds a ~12 ms floor per number).
    from huffman_tpu.utils.timing import amortized_time_fn

    return amortized_time_fn(fn, arg, iters=iters)


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
    from huffman_tpu.ops.device_codebook import device_code_lengths
    from huffman_tpu.ops.fused import encode_device
    from huffman_tpu.ops.histogram import histogram_matmul, histogram_scatter
    from huffman_tpu.ops.pallas_hist import histogram_pallas
    from huffman_tpu.runtime import native
    from huffman_tpu.utils.benchmark import silesia_like

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    on_tpu = jax.devices()[0].platform != "cpu"
    B = 512
    results = {}

    data = silesia_like(size_mb << 20, seed=7)
    nbytes = data.size
    symbols = data[: nbytes & ~1].view("<u2").astype(np.int32)
    n_pairs = symbols.size

    def rec(name, sec, denom=nbytes, unit="GB/s"):
        results[name] = round(denom / sec / 1e9, 3)
        print(f"{name:36s} {sec*1e3:9.3f} ms   {results[name]:8.3f} {unit}")

    # --- device stages -----------------------------------------------------
    sym_dev = jnp.asarray(symbols)
    sec = _time_amortized(jax, jnp, lambda a: histogram_pallas(a), sym_dev, 40)
    rec("histogram_pallas_int8", sec)
    sec = _time_amortized(jax, jnp, lambda a: histogram_scatter(a), sym_dev, 30)
    rec("histogram_scatter", sec)
    sec = _time_amortized(jax, jnp, lambda a: histogram_matmul(a), sym_dev, 30)
    rec("histogram_matmul", sec)

    hist = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    hist_dev = jnp.asarray(hist)
    sec = _time_amortized(
        jax, jnp, lambda a: device_code_lengths(a, max_len=18, alphabet_cap=8192),
        hist_dev, 30)
    print(f"{'device_codebook (K=8192 cap)':36s} {sec*1e3:9.3f} ms")
    results["device_codebook_capped_ms"] = round(sec * 1e3, 3)
    sec = _time_amortized(jax, jnp, lambda a: device_code_lengths(a), hist_dev, 30)
    results["device_codebook_ms"] = round(sec * 1e3, 3)
    print(f"{'device_codebook (package-merge)':36s} {sec*1e3:9.3f} ms")

    # fused encode (worst-case W = B keeps it shape-static)
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols
    pad_dev = jnp.asarray(padded)
    npairs_dev = jnp.asarray(n_pairs, jnp.int32)
    sec = _time_amortized(
        jax, jnp,
        lambda a: encode_device(a, npairs_dev, B, max_len=18)["streams"],
        pad_dev, 30,
    )
    rec("encode_device_fused", sec)

    # decode (the bench.py headline, inline)
    cb = Codebook.from_frequencies(hist.astype(np.int64))
    slab, _, lens = bf._encode_slab_numpy(symbols.astype(np.uint16), cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    t0 = time.perf_counter()
    streams = il.build_streams(slab, eff, n_real)
    rec("interleave_build (host native)", time.perf_counter() - t0)
    stacked, _ = il.pad_streams(streams)
    rows_per = stacked.shape[0] // (n_lanes // pd.GROUP_LANES)
    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    ngroups = n_lanes // pd.GROUP_LANES
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))
    args = (
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab), jnp.asarray(meta),
    )
    s_dev = jnp.asarray(stacked)
    sec = _time_amortized(
        jax, jnp,
        lambda a: pd.decode_groups(
            a, *args, B, rows_per, sym_rows,
            max_len=max(cb.max_len, 1), translate=translate,
            interpret=not on_tpu,
        ),
        s_dev, 30,
    )
    rec("decode_pallas (headline)", sec)

    # --- native host runtime ------------------------------------------------
    if native.available():
        raw = data.tobytes()
        t0 = time.perf_counter()
        blob = native.compress_reference(raw)
        rec("native_ref_compress (host)", time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = native.decompress_reference(blob)
        rec("native_ref_decompress (host)", time.perf_counter() - t0)
        assert out == raw
        results["ratio_silesia_like"] = round(len(blob) / nbytes, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
