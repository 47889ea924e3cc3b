"""Headline benchmark: Huffman decode AND encode GB/s per chip.

The reference publishes no performance numbers at all (BASELINE.md) and its
decoder is a sequential CPU tree walk; the north-star target from
BASELINE.json is the yardstick: decode >= 5 GB/s/chip (``vs_baseline`` =
value / 5.0). The encode lines measure the FUSED all-device pipeline
(Pallas histogram -> tiered package-merge codebook -> rank-select gather
-> Pallas pack -> stream deposit, one jit) against the round-3 stretch of
2 GB/s/chip (the round-2 1.0 target was beaten at 1.758) — the
reference's research territory is its GPU encoder, so the encode rate is
the other half of the headline.

Six metric lines (the driver parses the first two as the headline pair):
  1. decode, silesia-like 32 MiB (~3k unique pairs)  / 5.0
  2. encode, silesia-like 32 MiB                      / 2.0
  3. decode, wide 30k-unique-pair zipf 32 MiB         / 5.0  (rank tier +
     in-jit packed-16 translate — the data-adaptive path most likely to
     regress under tier churn, VERDICT r2 #8)
  4. encode, wide 30k 32 MiB                          / 1.0  (the full-
     alphabet lax.switch tier; VERDICT r2 missing #1 target)
  5. decode, pexels JPEG tiled to 32 MiB              / 5.0  (REAL bytes,
     65,289 unique — the full 65,536 rung on non-synthetic data;
     VERDICT r4 missing #2)
  6. encode, pexels JPEG tiled to 32 MiB              / 1.0

Method: the Pallas group decoder is timed steady-state on device-resident
streams by running K iterations inside ONE jit program, chained through a
loop-carried write into each group's padding slack (a semantic no-op the
compiler cannot hoist), so the environment's fixed dispatch overhead
(~50 ms per call through this axon tunnel — far larger than the kernel
itself) amortizes away instead of being subtracted noisily.

Prints one JSON line per metric, each {"metric", "value", "unit",
"vs_baseline"}.
"""

import json
import os
import sys

import numpy as np

# Persistent compile cache ON by default for the bench: a cold 6-metric
# run is ~28 min of mostly Mosaic/XLA compilation on this tunneled
# backend — within ~90 s of the driver's 1800 s budget (round 4 lost its
# official record to exactly this class of timeout). With the cache
# warm (any prior bench/chip_check run this round) the same run is
# minutes. Explicitly setting HTPU_COMPILE_CACHE (even to "") overrides.
os.environ.setdefault("HTPU_COMPILE_CACHE", "/root/repo/.jit_cache")


def _timed_repeat(fn, arg, iters: int):
    from huffman_tpu.utils.timing import amortized_time_fn

    # 5 reps: the chip is shared and a 3-rep median can land entirely
    # inside a noisy window (observed ±8-35% tenant interference).
    return amortized_time_fn(fn, arg, iters=iters, reps=5)


def _wide30k(nbytes: int, seed: int = 3) -> np.ndarray:
    """Zipf data over 30,000 unique byte-pair symbols (~2x the 16K tier
    boundary: lands in the full-alphabet top tier on encode and the rank
    tier + in-jit translate on decode)."""
    from huffman_tpu.utils.benchmark import zipf_pairs

    return zipf_pairs(nbytes, 30000, np.random.default_rng(seed))


def _pexels_tiled(nbytes: int) -> np.ndarray | None:
    """The reference's own JPEG (65,289 unique byte pairs — the one real
    full-alphabet input available offline; the reference encodes+decodes
    it end to end, /root/reference/Compressor.cu:385) tiled to the bench
    payload size: the top 65,536 tier on REAL bytes, where the synthetic
    metrics use zipf draws (VERDICT r4 missing #2)."""
    import os

    path = "/root/reference/pexels-vlad-alexandru-popa-1402787.jpg"
    if not os.path.exists(path):  # environment without the reference tree
        return None
    raw = np.fromfile(path, dtype=np.uint8)
    reps = -(-nbytes // raw.size)
    return np.tile(raw, reps)[:nbytes]


def _emit(metric, gbps, denom):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(gbps, 3),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / denom, 3),
            }
        ),
        flush=True,
    )


def bench_pair(data: np.ndarray, tag: str, on_tpu: bool,
               dec_baseline: float, enc_baseline: float) -> None:
    """Encode ``data`` to the interleaved container layout on the host,
    then time (a) the Pallas group decoder and (b) the fused device
    encoder, both steady-state in-jit, asserting bit-exactness first."""
    import jax
    import jax.numpy as jnp

    from huffman_tpu.codebook import Codebook, package_merge_lengths
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd

    B = 512
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    n_pairs = symbols.size
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    ngroups = n_lanes // pd.GROUP_LANES

    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    cb = Codebook.from_lengths(package_merge_lengths(freqs, 18))
    slab, _, lens = bf._encode_slab_numpy(
        symbols.astype(np.uint16), cb, n_lanes, B
    )
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    streams = il.build_streams(slab, eff, n_real)
    stacked, _ = il.pad_streams(streams)
    rows_per = stacked.shape[0] // ngroups

    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))

    args = (
        jnp.asarray(stacked),
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab),
        jnp.asarray(meta),
    )

    # Rank-tier alphabets (translate=False) must include the in-jit
    # packed-16 rank->symbol translation in the timed program — the
    # container's device path runs it in the same jit, and the metric
    # claims COMPLETE decode (to symbols, not ranks).
    sym_order_dev = (
        None if translate else jnp.asarray(cb.sym_order.astype(np.int32))
    )

    def run(streams_dev):
        # packed_out: the kernel's 16-bit pair words ARE the final symbol
        # stream — the complete decode, without an unpack the container
        # path doesn't perform either. Rank-tier alphabets translate the
        # packed rank pairs in-program (gather_u16_pairs_pallas), matching
        # the container's device path.
        return pd.decode_groups(
            streams_dev, *args[1:], B, rows_per, sym_rows,
            max_len=max(cb.max_len, 1), translate=translate,
            min_len=min_len, interpret=not on_tpu, packed_out=True,
            sym_order_dev=sym_order_dev,
        )

    out = np.asarray(run(args[0]))
    dec = (
        out.reshape(ngroups, B // 2, 8, 128)
        .transpose(0, 2, 3, 1)
        .astype(np.uint32, order="C")  # contiguous; words are '<u2' pairs
        .view("<u2")
        .reshape(-1)[:n_pairs]
        .astype(np.int64)
    )
    assert np.array_equal(dec, symbols), "decode mismatch — benchmark invalid"

    # iters must swamp the ~60 ms tunneled dispatch: at iters=20 the
    # overhead/iters term understated the round-1 headline by ~2x.
    sec = _timed_repeat(run, args[0], iters=80 if on_tpu else 1)
    _emit(f"huffman_decode_throughput_{tag}", n_pairs * 2 / sec / 1e9,
          dec_baseline)

    # ---- encode: the fused all-device pipeline ---------------------------
    from huffman_tpu.ops.fused import encode_device

    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols
    pad_dev = jax.device_put(jnp.asarray(padded))
    npairs_dev = jnp.asarray(n_pairs, jnp.int32)
    # Tight per-group cap from the host-known bit totals (callers with a
    # corpus bound size it the same way), bucketed for shape stability.
    gwords = (eff.sum(axis=1).astype(np.int64) >> 5)
    gwords[n_real:] = 0
    cap = int(gwords.reshape(-1, pd.GROUP_LANES).sum(axis=1).max())
    cap = (cap + 4096 + 8191) // 8192 * 8192

    def run_enc(sym_dev):
        return encode_device(
            sym_dev, npairs_dev, B, words_cap=cap, max_len=18,
            interpret=not on_tpu,
        )["streams"]

    r = encode_device(
        pad_dev, npairs_dev, B, words_cap=cap, max_len=18,
        interpret=not on_tpu,
    )
    assert bool(r["ok"]), "fused encoder rejected the bench corpus"
    counts = np.asarray(r["counts"])
    st = np.asarray(r["streams"])
    for g, rs in enumerate(streams):
        assert counts[g] == rs.size and np.array_equal(
            st[g, : rs.size], rs
        ), f"encode mismatch group {g} — benchmark invalid"

    sec_e = _timed_repeat(run_enc, pad_dev, iters=40 if on_tpu else 1)
    _emit(f"huffman_encode_throughput_{tag}", n_pairs * 2 / sec_e / 1e9,
          enc_baseline)


def main() -> None:
    from huffman_tpu.utils.chiplock import guard_chip

    # Serialize on the single chip BEFORE backend init; the runtime bound
    # tracks the driver's own 1800 s timeout (a hung bench must free the
    # chip before the next consumer, not wedge it).
    guard_chip(max_runtime_s=1740)

    import jax

    from huffman_tpu.utils.benchmark import silesia_like

    on_tpu = jax.devices()[0].platform != "cpu"
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    bench_pair(
        silesia_like(size_mb << 20, seed=7),
        f"silesia_like_{size_mb}MB", on_tpu,
        dec_baseline=5.0, enc_baseline=2.0,
    )
    # Same payload size as the headline pair (r4: the wide tier
    # originally ran at 16 MiB, understating it ~3-4% — larger payloads
    # amortize the per-launch fixed cost exactly as the 32 vs 64 MiB
    # headline comparison in RESULTS.md shows).
    wide_mb = size_mb
    bench_pair(
        _wide30k(wide_mb << 20),
        f"wide30k_{wide_mb}MB", on_tpu,
        dec_baseline=5.0, enc_baseline=1.0,
    )
    # Real-data rung: the reference's JPEG tiled to the bench payload —
    # near-incompressible, full-alphabet (65,289 unique), the only
    # non-synthetic bytes that exercise the top tier in this offline
    # environment. Baselines follow the wide-tier bars.
    pexels = _pexels_tiled(size_mb << 20)
    if pexels is not None:
        bench_pair(
            pexels, f"pexels_jpeg_{size_mb}MB", on_tpu,
            dec_baseline=5.0, enc_baseline=1.0,
        )


if __name__ == "__main__":
    main()
