"""Whole-pipeline fused device programs.

``encode_device`` runs histogram -> codebook construction -> canonical
tables -> per-block bit-pack -> interleaved stream assembly as ONE XLA
program. The reference's encoder crosses the host/device boundary 10+
times and builds its codebook into host std::strings (SURVEY.md §3.1);
here the only D2H copy is the finished payload.

``roundtrip_device`` chains the fused encoder with the Pallas lane decoder
for an on-device self-check (the make-test roundtrip, without the host).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..constants import ALPHABET_TIERS, MAX_CODE_LEN, MAX_SYMBOLS
from . import encode as enc
from .device_codebook import device_canonical_tables, device_code_lengths
from .device_interleave import build_streams_device
from .histogram import histogram_matmul
from .pallas_decode import GROUP_LANES, WINDOW_ROWS

# Data-adaptive alphabet tiers (r3): the codebook's package-merge rounds
# and the rank-select dictionary's dense table both size by the tier cap,
# so small alphabets (the common case) pay small sorts and shallow gather
# trees while the TOP tier covers the full 16-bit alphabet — the fused
# encoder is exact for EVERY input (the reference runs its whole encode
# on-GPU at full alphabet too, Compressor.cu:385,
# gpuHuffmanConstruction.h:695; rounds 1-2 here flagged >8192-unique
# inputs and re-ran whole programs instead). The ladder is shared with
# the host codebook builder (constants.ALPHABET_TIERS): package-merge
# lengths are cap-invariant past n_unique, so host and device agree.
DEFAULT_TIERS = ALPHABET_TIERS

# Symbol-gather scheme boundary: tiers with cap >= this use the two-level
# canonical-rank gather (16-bit canonical ranks, HALF the dense rows +
# arithmetic coding — pallas_gather.gather_rank_canonical), smaller tiers
# the packed-code rank-select. MEASURED r5 (16 MiB zipf, K=40,
# perflogs/r5_rank_canon*.log, packed-default vs canon-best ms):
# 4096 3.25 vs 3.55 (packed WINS — the ~17 length compares cost more
# than 16 saved table rows), 16384 4.54 vs 4.35, 32768 6.32 vs 5.17
# (-18%), 65536 10.19 vs 7.14 (-30%; identity addressing drops the rank
# stage on top). Boundary 16384; env override for the perf harness.
CANON_GATHER_MIN_CAP = int(os.environ.get("HTPU_CANON_MIN_CAP", "16384"))


def tiered_code_gather(
    hist, n_unique, sym2, *, max_len: int, cap_top: int,
    tiers: tuple[int, ...], interpret: bool,
):
    """Codebook + canonical tables + rank-select symbol gather under a
    data-adaptive ``lax.switch``: XLA:TPU executes ONLY the selected
    branch, so the per-input cost tracks its own alphabet size (the cond
    itself measured free, r2). Returns ``(lengths, lj_limit, base,
    sym_rank, packed, ok)`` with ``packed = len<<26|code`` per symbol;
    ``ok`` is False only when n_unique exceeds ``cap_top`` (with the
    default full-alphabet top tier it is always True)."""
    from .pallas_gather import (
        build_rank_select, gather_rank_canonical, gather_rank_select,
    )

    ladder = tuple(t for t in sorted(set(tiers)) if t < cap_top) + (cap_top,)

    def tier(cap):
        def run(h):
            lengths = device_code_lengths(
                h, max_len=max_len, alphabet_cap=cap,
                use_kernel=not interpret,
            )
            tabs = device_canonical_tables(lengths)
            enc_codes, enc_lens = tabs[0], tabs[1]
            if cap >= CANON_GATHER_MIN_CAP:
                # Two-level canonical scheme: the dense table holds 16-bit
                # canonical RANKS (two per word — half the select-tree
                # rows of the packed-code table), and the kernel derives
                # len by compares against the class starts and code =
                # canon - base[len] (mod 2^32) — the decode-side rank
                # identity reversed. Bit-identical to the packed-code
                # gather (tests pin both against the host codebook).
                base, sym_rank = tabs[3], tabs[4]
                if cap >= MAX_SYMBOLS:
                    # Full-alphabet tier: every symbol slot has a table
                    # entry, so the dense table is sym_rank itself packed
                    # and the kernel addresses it by SYMBOL (identity
                    # rank) — no succinct rank stage, no build scatter.
                    sr = sym_rank.astype(jnp.uint32)
                    canon16 = sr[0::2] | (sr[1::2] << 16)
                    maskw = jnp.zeros((2048,), jnp.uint32)
                    cums = jnp.zeros((2048,), jnp.int32)
                    pack_ok = jnp.bool_(True)
                else:
                    maskw, cums, dense, pack_ok = build_rank_select(
                        sym_rank.astype(jnp.uint32), lengths > 0, cap=cap
                    )
                    canon16 = dense[0::2] | (dense[1::2] << 16)
                ls = jnp.arange(1, MAX_CODE_LEN + 1, dtype=jnp.int32)
                counts = jnp.sum(
                    (lengths[None, :] == ls[:, None]).astype(jnp.int32),
                    axis=1,
                )
                start = jnp.concatenate(
                    [jnp.zeros(2, jnp.int32),
                     jnp.cumsum(counts)[: MAX_CODE_LEN - 1]]
                )
                packed = gather_rank_canonical(
                    sym2, maskw, cums, canon16, start, base,
                    max_len=max_len, interpret=interpret,
                    identity_rank=cap >= MAX_SYMBOLS,
                )
            else:
                enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
                maskw, cums, dense, pack_ok = build_rank_select(
                    enc_packed, lengths > 0, cap=cap
                )
                packed = gather_rank_select(
                    sym2, maskw, cums, dense, interpret=interpret
                )
            return (lengths, *tabs[2:], packed, pack_ok)

        return run

    if len(ladder) == 1:
        out = tier(ladder[0])(hist)
    else:
        idx = jnp.int32(0)
        for t in ladder[:-1]:
            idx = idx + (n_unique > t).astype(jnp.int32)
        out = jax.lax.switch(idx, [tier(c) for c in ladder], hist)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "words_per_block", "words_cap", "max_len", "interpret",
        "gather", "alphabet_cap", "tiers",
    ),
)
def encode_device(
    symbols: jax.Array,   # (n_lanes * B,) int32, zero-padded past n_pairs
    n_pairs: jax.Array,   # scalar int32 count of real symbols
    B: int,
    words_per_block: int | None = None,
    words_cap: int | None = None,
    max_len: int = MAX_CODE_LEN,
    interpret: bool = False,  # Pallas interpret mode (CPU tests)
    gather: str = "auto",     # "displacement" | "xla" | "auto"
    alphabet_cap: int | None = None,
    tiers: tuple[int, ...] = DEFAULT_TIERS,
):
    """Fused encode. Returns a dict with the interleaved payload
    (``streams`` (ngroups, 2*1024+cap) u32 + ``counts``), the dense code
    ``lengths`` (for the container codebook header), per-block ``bits``,
    the decode tables (``lj_limit``, ``base``, ``sym_rank``), and ``ok``.

    Fast-tier structure (the measured walls, scripts/perf_encode.py): the
    package-merge codebook's round cost and the rank-select dictionary's
    dense table size by a DATA-ADAPTIVE alphabet tier (``tiers``, selected
    by this input's n_unique under ``lax.switch`` — only the taken branch
    executes), and the symbol gather goes through the on-device
    rank-select dictionary + the Pallas lane-gather kernel (61.5 ->
    3.7 ms/16 MiB) instead of XLA's per-element gather. The default top
    tier covers the FULL 16-bit alphabet, so the fast tier is exact for
    every input and ``ok`` is structurally True whenever ``max_len <= 26``
    — no rerun ladder. Passing an explicit ``alphabet_cap`` restores the
    flag-and-rerun contract (``ok`` False past the cap; output bytes then
    garbage, never silently wrong); ``gather="xla"`` selects the
    any-``max_len`` exact tier (dense packed-16 gather, uncapped
    codebook).

    ``words_cap`` (per-group stream words) defaults to the B*GROUP_LANES
    worst case so the program is shape-static with no host-visible scan
    result; callers with host-visible bit totals may pass a tighter bound
    (it must cover EVERY group, not the average). ``words_per_block`` only
    applies to the slab fallback taken when n_lanes isn't group-aligned.
    """
    n_total = symbols.shape[0]
    n_lanes = n_total // B
    W = words_per_block or B
    cap = words_cap or B * GROUP_LANES
    if gather == "auto":
        # Interpreted runs (CPU tests / compile checks) stay on the XLA
        # gather: the displacement kernel's unrolled lane-gather tree is
        # built for Mosaic, not the interpreter.
        gather = "displacement" if (max_len <= 26 and not interpret) else "xla"
    symbols = symbols.astype(jnp.int32)
    idx = jnp.arange(n_total, dtype=jnp.int32)
    valid = idx < n_pairs

    # MXU histogram: the one-hot outer-product accumulation — as a Pallas
    # kernel on device (transposed int8 one-hots built in VMEM, int32
    # VMEM scratch accumulator; ~4x the XLA scan formulation), XLA matmuls
    # under the interpreter. Padding symbols route to bin 0 and are
    # subtracted.
    n_pad = jnp.sum(~valid)
    masked = jnp.where(valid, symbols, 0)
    if interpret:
        hist = histogram_matmul(masked, chunk=4096)
    else:
        from .pallas_hist import histogram_pallas

        hist = histogram_pallas(masked)
    hist = hist.at[0].add(-n_pad)
    n_unique = jnp.sum((hist > 0).astype(jnp.int32))
    ok = jnp.bool_(True)
    if alphabet_cap is not None:
        ok = ok & (n_unique <= alphabet_cap)

    sym2 = symbols.reshape(n_lanes, B)
    val2 = valid.reshape(n_lanes, B)
    if gather == "displacement":
        if max_len > 26:
            raise ValueError("fast-tier gather requires max_len <= 26")
        # Rank-select (succinct-dictionary) structure: its build is fully
        # vectorized (bit-pack + cumsum + one monotone scatter, ~1 ms) —
        # the row-displacement FFD pack is sequential and costs ~140 ms as
        # an in-jit loop, so it stays a HOST-side builder (container path).
        lengths, lj_limit, base, sym_rank, packed, pack_ok = (
            tiered_code_gather(
                hist, n_unique, sym2, max_len=max_len,
                cap_top=alphabet_cap or MAX_SYMBOLS, tiers=tiers,
                interpret=interpret,
            )
        )
        ok = ok & pack_ok
        codes = jnp.where(val2, packed & jnp.uint32((1 << 26) - 1), 0)
        lens = jnp.where(val2, (packed >> 26).astype(jnp.int32), 0)
    else:
        lengths = device_code_lengths(
            hist, max_len=max_len, alphabet_cap=alphabet_cap,
            use_kernel=not interpret and max_len >= 2,
        )
        enc_codes, enc_lens, lj_limit, base, sym_rank = device_canonical_tables(
            lengths
        )
        if max_len <= 26 and not interpret:
            # Exact any-alphabet tier: the dense 65,536-entry table as two
            # packed-16 Pallas gathers (~4x XLA's per-element gather).
            from .pallas_gather import gather_packed32_dense

            enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
            packed = gather_packed32_dense(sym2, enc_packed)
            codes = jnp.where(val2, packed & jnp.uint32((1 << 26) - 1), 0)
            lens = jnp.where(val2, (packed >> 26).astype(jnp.int32), 0)
        elif max_len <= 26:
            # One gather instead of two (len << 26 | code), packed on device.
            enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
            codes, lens = enc.gather_codes_packed(sym2, enc_packed, val2)
        else:
            codes, lens = enc.gather_codes(sym2, enc_codes, enc_lens, val2)
    offsets, bits = enc.block_offsets(lens)
    min_len = jnp.min(jnp.where(lengths > 0, lengths, MAX_CODE_LEN + 1))
    min_len = jnp.minimum(min_len, MAX_CODE_LEN)  # empty alphabet guard
    eff = jnp.where(val2, lens, min_len).astype(jnp.int32)
    n_real = (n_pairs + B - 1) // B
    if n_lanes % GROUP_LANES == 0:
        # Direct staging -> stream: the Pallas packer runs on the protocol
        # lengths and the interleaved payload assembles without ever
        # materializing the per-lane slab.
        from .pallas_encode import pack_streams_pallas

        streams, counts = pack_streams_pallas(
            codes, eff, n_real, words_cap=cap, interpret=interpret
        )
    else:
        slab = enc.pack_blocks(codes, lens, offsets, W)
        streams, counts = build_streams_device(slab, eff, n_real, words_cap=cap)
    return {
        "streams": streams,
        "counts": counts,
        "lengths": lengths,
        "bits": bits,
        "hist": hist,
        "lj_limit": lj_limit,
        "base": base,
        "sym_rank": sym_rank,
        "ok": ok,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "words_cap", "max_len", "interpret", "gather", "alphabet_cap",
        "tiers",
    ),
)
def encode_device_bytes(
    data_bytes: jax.Array,  # (n_lanes * B * 2,) uint8, zero-padded
    n_pairs: jax.Array,
    B: int,
    words_cap: int | None = None,
    max_len: int = MAX_CODE_LEN,
    interpret: bool = False,
    gather: str = "auto",
    alphabet_cap: int | None = None,
    tiers: tuple[int, ...] = DEFAULT_TIERS,
):
    """Container front end of ``encode_device``: ships RAW BYTES through
    the host->device link (half the volume of int32 symbols — the ~50 MB/s
    tunnel, not the kernels, bounds container wall time here) and forms
    byte-pair symbols on device. One program end to end."""
    from .histogram import bytes_to_symbols_device

    symbols = bytes_to_symbols_device(data_bytes)
    return encode_device(
        symbols, n_pairs, B, words_cap=words_cap, max_len=max_len,
        interpret=interpret, gather=gather, alphabet_cap=alphabet_cap,
        tiers=tiers,
    )


def streams_to_kernel_layout(streams: jax.Array, rows_bucket: int = 64):
    """(ngroups, width) device streams -> the (ngroups*rows, 128) layout
    the Pallas decoder consumes (device twin of interleave.pad_streams;
    padding is already zeros by construction)."""
    ngroups, width = streams.shape
    rows = (width + 127) // 128 + WINDOW_ROWS
    rows = (rows + rows_bucket - 1) // rows_bucket * rows_bucket
    pad = rows * 128 - width
    padded = jnp.pad(streams, ((0, 0), (0, pad)))
    return padded.reshape(ngroups * rows, 128), rows


@functools.partial(jax.jit, static_argnames=("B", "max_len", "interpret"))
def roundtrip_device(symbols: jax.Array, n_pairs: jax.Array, B: int,
                     max_len: int = MAX_CODE_LEN, interpret: bool = False):
    """Encode on device, decode on device (XLA lane decoder — works on any
    backend, unlike Mosaic), compare. Returns (ok, payload_words)."""
    from . import decode as dec

    r = encode_device(symbols, n_pairs, B, max_len=max_len, interpret=interpret)
    n_total = symbols.shape[0]
    n_lanes = n_total // B

    # Decode straight from the per-lane slab layout rebuilt from tables
    # (the XLA decoder reads per-block slabs, not interleaved streams — the
    # interleaved payload is checked bit-exactly by the Pallas kernel tests).
    enc_codes, enc_lens, *_ = device_canonical_tables(r["lengths"])
    sym2 = symbols.reshape(n_lanes, B).astype(jnp.int32)
    valid = (jnp.arange(n_total, dtype=jnp.int32) < n_pairs).reshape(n_lanes, B)
    codes, lens = enc.gather_codes(sym2, enc_codes, enc_lens, valid)
    offsets, _ = enc.block_offsets(lens)
    slab = enc.pack_blocks(codes, lens, offsets, B)

    # sym_order from sym_rank by scatter.
    sym_order = jnp.zeros((MAX_SYMBOLS,), jnp.int32).at[
        jnp.where(r["lengths"] > 0, r["sym_rank"], MAX_SYMBOLS - 1)
    ].max(jnp.arange(MAX_SYMBOLS, dtype=jnp.int32) * (r["lengths"] > 0))
    dec_max_len = jnp.maximum(jnp.max(r["lengths"]), 1)
    out = dec.decode_blocks(
        slab, r["lj_limit"], r["base"], sym_order, B, dec_max_len
    )
    ok = jnp.all(jnp.where(valid, out == sym2, True))
    return ok, jnp.sum(r["counts"])


def encode_device_auto(
    symbols: jax.Array,
    n_pairs,
    B: int,
    max_len: int = MAX_CODE_LEN,
    words_cap: int | None = None,
    interpret: bool = False,
):
    """``encode_device`` with the residual fallback applied.

    Since r3 the fast tier's in-program alphabet tiers reach the full
    16-bit alphabet, so for ``max_len <= 26`` the FIRST run is always
    valid and this is a plain call. The only remaining rung is the
    ``max_len > 26`` case (codes too wide for the len<<26 packing), which
    goes straight to the exact xla tier. Returns the result dict.
    """
    if max_len <= 26:
        r = encode_device(
            symbols, n_pairs, B, words_cap=words_cap, max_len=max_len,
            interpret=interpret,
        )
        if bool(r["ok"]):
            return r
    return encode_device(
        symbols, n_pairs, B, words_cap=words_cap, max_len=max_len,
        interpret=interpret, gather="xla", alphabet_cap=None,
    )
