"""Group-interleaved stream construction (encode) and its NumPy decode twin.

The Pallas decoder (ops/pallas_decode.py) reads ONE sequential word stream
per group of 1024 block-lanes; the ENCODER must therefore emit each lane's
packed words in exactly the order the decoder will consume them. That order
is fully determined by the decode protocol and the codeword lengths, so the
encoder simulates the decoder:

* every lane starts with words 0,1 preloaded (64 bits);
* at step t a lane consumes len(symbol_t) bits; once its valid bits drop
  below 33 it refills one word;
* refilling lanes within a step take consecutive stream slots in lane-id
  order.

Past a lane's last real symbol the buffer holds only zero bits, which
canonically decode as rank 0 (the all-zeros code) of length min_len — the
simulation accounts for those garbage steps so encoder and decoder stay in
lockstep. Pad lanes (>= the real block count) never refill.

This module is pure NumPy — it doubles as the CPU decode backend and the
bit-exact reference for kernel tests.
"""

from __future__ import annotations

import numpy as np

from ..codebook import Codebook
from ..ops.pallas_decode import (
    GROUP_LANES,
    PRELOAD_WORDS,
    REFILL_THRESHOLD,
    WINDOW_ROWS,
)


def effective_lengths(
    lens: np.ndarray, n_pairs: int, min_len: int, n_lanes: int, B: int
) -> np.ndarray:
    """(n_lanes, B) per-step consumed bits: real codeword lengths followed
    by min_len for the zero-bit garbage steps after a lane's data ends."""
    out = np.full((n_lanes, B), min_len, dtype=np.int32)
    flat = out.reshape(-1)
    flat[:n_pairs] = lens.reshape(-1)[:n_pairs]
    return out


def build_streams(
    slab: np.ndarray, eff_lens: np.ndarray, n_real_lanes: int
) -> list[np.ndarray]:
    """Dispatcher: native C++ simulation when available, NumPy otherwise."""
    try:
        from ..runtime import native

        if native.available():
            return native.interleave_build(slab, eff_lens, n_real_lanes)
    except ImportError:
        pass
    return build_interleaved_streams(slab, eff_lens, n_real_lanes)


def decode_interleaved(
    stream: np.ndarray, cb: Codebook, n_steps: int, n_real_lanes: int
) -> np.ndarray:
    """Dispatcher for the CPU interleaved decode twin."""
    try:
        from ..runtime import native

        if native.available():
            return native.interleave_decode(stream, cb, n_steps, n_real_lanes)
    except ImportError:
        pass
    return decode_interleaved_numpy(stream, cb, n_steps, n_real_lanes)


def build_interleaved_streams(
    slab: np.ndarray,       # (n_lanes, W) uint32 per-lane packed words
    eff_lens: np.ndarray,   # (n_lanes, B) int32 per-step bit consumption
    n_real_lanes: int,      # lanes beyond this are pads (never refill)
) -> list[np.ndarray]:
    """Simulate the decoder and emit one interleaved word stream per group.

    Returns a list of uint32 arrays (one per group of GROUP_LANES lanes),
    each beginning with the PRELOAD_WORDS * GROUP_LANES preload words.
    """
    n_lanes, B = eff_lens.shape
    W = slab.shape[1]
    n_groups = (n_lanes + GROUP_LANES - 1) // GROUP_LANES
    if n_lanes % GROUP_LANES:
        raise ValueError("n_lanes must be padded to a multiple of GROUP_LANES")

    real = np.arange(n_lanes) < n_real_lanes
    bits = np.where(real, 64, 1 << 30).astype(np.int64)
    nxt = np.full(n_lanes, PRELOAD_WORDS, dtype=np.int64)

    def lane_word(lanes, idx):
        w = np.where(idx < W, np.minimum(idx, W - 1), 0)
        v = slab[lanes, w]
        return np.where(idx < W, v, 0).astype(np.uint32)

    step_lanes: list[np.ndarray] = []
    step_words: list[np.ndarray] = []
    for t in range(B):
        bits -= eff_lens[:, t]
        mask = bits < REFILL_THRESHOLD
        idx = np.flatnonzero(mask)  # ascending == lane-id order
        if idx.size:
            step_lanes.append(idx)
            step_words.append(lane_word(idx, nxt[idx]))
            nxt[idx] += 1
            bits[idx] += 32
        if np.any(bits < 1):
            raise AssertionError("decode protocol invariant broken")

    if step_lanes:
        all_lanes = np.concatenate(step_lanes)
        all_words = np.concatenate(step_words)
    else:
        all_lanes = np.zeros(0, dtype=np.int64)
        all_words = np.zeros(0, dtype=np.uint32)
    group_of = all_lanes // GROUP_LANES

    streams = []
    for g in range(n_groups):
        lanes = np.arange(g * GROUP_LANES, (g + 1) * GROUP_LANES)
        pre0 = lane_word(lanes, np.zeros(GROUP_LANES, dtype=np.int64))
        pre1 = lane_word(lanes, np.ones(GROUP_LANES, dtype=np.int64))
        body = all_words[group_of == g]
        streams.append(np.concatenate([pre0, pre1, body]).astype(np.uint32))
    return streams


def pad_streams(streams: list[np.ndarray], rows_bucket: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Pad per-group streams to a common row count (multiple of
    ``rows_bucket`` rows of 128 words, plus the decoder's window slack).
    Returns (stacked (ngroups*rows, 128) uint32, per-group word counts)."""
    counts = np.array([s.size for s in streams], dtype=np.int64)
    max_words = int(counts.max(initial=0))
    rows = (max_words + 127) // 128 + WINDOW_ROWS
    rows = (rows + rows_bucket - 1) // rows_bucket * rows_bucket
    out = np.zeros((len(streams), rows * 128), dtype=np.uint32)
    for g, s in enumerate(streams):
        out[g, : s.size] = s
    return out.reshape(len(streams) * rows, 128), counts


def decode_interleaved_numpy(
    stream: np.ndarray,   # (words,) uint32 one group's interleaved stream
    cb: Codebook,
    n_steps: int,
    n_real_lanes: int,
) -> np.ndarray:
    """Bit-exact NumPy twin of the Pallas kernel for one group. Returns
    (n_steps, GROUP_LANES) int32 symbols (garbage beyond real data)."""
    L = GROUP_LANES
    pad = np.zeros(max(0, PRELOAD_WORDS * L - stream.size), dtype=np.uint32)
    stream = np.concatenate([stream, pad])
    bufA = stream[0:L].astype(np.uint64)
    bufB = stream[L : 2 * L].astype(np.uint64)
    lane = np.arange(L)
    bits = np.where(lane < n_real_lanes, 64, 1 << 30).astype(np.int64)
    head = PRELOAD_WORDS * L

    lj = cb.lj_limit.astype(np.uint64)
    base = (cb.base & 0xFFFFFFFF).astype(np.uint64)
    sym_order = cb.sym_order.astype(np.int64)
    max_len = max(cb.max_len, 1)
    out = np.zeros((n_steps, L), dtype=np.int32)
    M32 = np.uint64(0xFFFFFFFF)

    for t in range(n_steps):
        peek = bufA
        length = np.minimum(
            1 + (peek[:, None] >= lj[None, :]).sum(axis=1), max_len
        ).astype(np.int64)
        rank = (base[length] + (peek >> (np.uint64(32) - length.astype(np.uint64)))) & M32
        rank = rank.astype(np.int64)
        safe = np.clip(rank, 0, max(sym_order.size - 1, 0))
        out[t] = sym_order[safe] if sym_order.size else 0

        ln = length.astype(np.uint64)
        bufA = np.where(
            length == 32,
            bufB,
            (((bufA << ln) & M32) | (bufB >> ((np.uint64(32) - ln) & np.uint64(63)))),
        )
        bufB = np.where(length == 32, 0, (bufB << length.astype(np.uint64)) & M32)
        bits = bits - length

        mask = bits < REFILL_THRESHOLD
        idx = np.flatnonzero(mask)
        if idx.size:
            slots = head + np.arange(idx.size)
            words = np.where(slots < stream.size, stream[np.minimum(slots, stream.size - 1)], 0).astype(np.uint64)
            bpos = bits[idx].astype(np.uint64)
            addA = np.where(bpos < 32, words >> bpos, 0)
            addB = np.where(
                bpos == np.uint64(32),
                words,
                (words << ((np.uint64(32) - bpos) & np.uint64(63))) & M32,
            )
            bufA[idx] |= addA
            bufB[idx] |= addB
            bits[idx] += 32
            head += idx.size
    return out
