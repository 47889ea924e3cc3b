"""Huffman codebook construction and canonical code tables.

TPU-first design decision (see SURVEY.md §7): the reference builds the tree
*on the GPU* with a persistent kernel and a hand-rolled grid-wide barrier
(reference: gpuHuffmanConstruction.h:353-466, 78-135) because round-tripping
to the host was deemed expensive. On TPU the alphabet is at most 65,536
symbols, a host two-queue build costs ~1 ms, and everything downstream only
needs *code lengths* — so construction lives on the host, produces
**canonical codes**, and ships two dense tables to the device:

* encode side: ``enc_len[65536]`` / ``enc_code[65536]`` for vectorized gather;
* decode side: 32-entry canonical boundary tables + the symbol permutation,
  enabling branch-free table decode (no tree walk — unlike the reference's
  sequential pointer chase, Decompressor.cu:259-291).

The two-queue algorithm is the classical O(n) construction over
frequency-sorted leaves (the reference's CPU baseline uses the same classic
algorithm, baseline/Compressor.cu:118-164; ours is an independent
implementation with deterministic (freq, symbol) tie-breaking).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import MAX_CODE_LEN, MAX_SYMBOLS


def code_lengths_from_frequencies(freqs: np.ndarray) -> np.ndarray:
    """Optimal prefix-code lengths for a dense frequency table.

    Parameters
    ----------
    freqs : (MAX_SYMBOLS,) nonnegative integer array.

    Returns
    -------
    lengths : (MAX_SYMBOLS,) uint8 array; 0 for absent symbols. A single
        unique symbol gets length 1 (the degenerate tree), fixing the
        reference's silent-empty-output bug for such inputs (SURVEY.md §4).
    """
    freqs = np.asarray(freqs)
    if freqs.shape == (MAX_SYMBOLS,):
        # The native two-queue builder (same algorithm, same tie-breaking)
        # is ~50x faster on full-alphabet inputs. Only loading problems
        # fall through — the native library's own validation errors (e.g.
        # negative counts) must propagate, not silently degrade to a
        # Python path that would accept the invalid input.
        try:
            from .runtime import native

            use_native = native.available()
        except ImportError:
            use_native = False
        if use_native:
            return native.code_lengths(freqs)
    present = np.flatnonzero(freqs)
    n = present.size
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    if n == 0:
        return lengths
    if n == 1:
        lengths[present[0]] = 1
        return lengths

    # Leaves sorted ascending by (freq, symbol): deterministic tie-break.
    leaf_freq = freqs[present].astype(np.int64)
    order = np.lexsort((present, leaf_freq))
    leaf_freq = leaf_freq[order]
    leaf_sym = present[order]

    # Two-queue merge. Queue 1: sorted leaves. Queue 2: internal nodes in
    # creation order (their frequencies are non-decreasing by construction).
    # Ties prefer the internal node — this can DEEPEN trees relative to the
    # leaf-preferring choice, but it empirically reproduces the reference's
    # exact compressed sizes (romeo.txt -> 91,732 B; tests pin this), so it
    # is part of the interop contract. The native C++ twin matches.
    int_freq = np.empty(n - 1, dtype=np.int64)
    left = np.empty(n - 1, dtype=np.int64)   # child ids; leaves are [0, n)
    right = np.empty(n - 1, dtype=np.int64)  # internals are n + k
    li = 0  # next leaf
    ii = 0  # next internal to consume
    for k in range(n - 1):
        picks = []
        for _ in range(2):
            take_leaf = li < n and (ii >= k or leaf_freq[li] < int_freq[ii])
            if take_leaf:
                picks.append((li, leaf_freq[li]))
                li += 1
            else:
                picks.append((n + ii, int_freq[ii]))
                ii += 1
        (a, fa), (b, fb) = picks
        int_freq[k] = fa + fb
        left[k] = a
        right[k] = b

    # Depth of each leaf = code length. Walk internals root-first.
    depth = np.zeros(2 * n - 1, dtype=np.int64)
    for k in range(n - 2, -1, -1):
        d = depth[n + k] + 1
        depth[left[k]] = d
        depth[right[k]] = d

    leaf_depth = depth[:n]
    if leaf_depth.max() > MAX_CODE_LEN:
        # Pathological frequency profile; flatten via length-limited rebuild.
        leaf_depth = _limit_lengths(leaf_freq, leaf_depth, MAX_CODE_LEN)
    lengths[leaf_sym] = leaf_depth.astype(np.uint8)
    return lengths


def _limit_lengths(freqs: np.ndarray, depths: np.ndarray, limit: int) -> np.ndarray:
    """Optimal length-limited lengths via boundary package-merge (the same
    algorithm as ops/device_codebook.py, in NumPy so the host builder has
    no jax dependency). Only reachable for inputs whose optimal code
    exceeds MAX_CODE_LEN bits. A clamp-then-deepen Kraft repair is NOT
    sufficient here: deepening by powers of two can overshoot below the
    Kraft equality, which Codebook.from_lengths rejects."""
    del depths  # rebuilt from scratch, optimally
    n = freqs.size
    leaf_w = np.sort(freqs.astype(np.float64))
    # Level lists: weights plus is-package flags; leaves merge in sorted.
    cur_w = leaf_w
    flags_by_level = [np.zeros(n, dtype=bool)]
    for _ in range(limit - 1):
        pk = cur_w[0 : cur_w.size - (cur_w.size % 2)]
        pk = pk[0::2] + pk[1::2]
        w = np.concatenate([leaf_w, pk])
        f = np.concatenate(
            [np.zeros(n, dtype=bool), np.ones(pk.size, dtype=bool)]
        )
        order = np.argsort(w, kind="stable")
        cur_w = w[order]
        flags_by_level.append(f[order])

    lengths_by_rank = np.zeros(n, dtype=np.int64)
    c = 2 * n - 2
    ranks = np.arange(n)
    for lvl in range(limit - 1, -1, -1):
        flags = flags_by_level[lvl]
        p = int(flags[:c].sum())
        m = c - p
        lengths_by_rank += ranks < m
        c = 2 * p
    # Map rank-order lengths back to the caller's (sorted) order: the
    # caller passes freqs already ascending, so rank order IS input order.
    return lengths_by_rank


def package_merge_lengths(freqs: np.ndarray, max_len: int) -> np.ndarray:
    """Dense optimal length-limited code lengths: the NumPy twin of
    ops.device_codebook.device_code_lengths, BIT-IDENTICAL per symbol
    (pinned by tests/test_device_codebook.py). Both sides order leaves by
    (weight, symbol) and break leaf/package weight ties leaves-first, so
    the host container builder and the fused device encoder derive the
    same codebook — the container's host/device byte-identity depends on
    it. Pure NumPy: no jit, no compile cost on the host path.

    Parameters: ``freqs`` dense (MAX_SYMBOLS,) histogram; ``max_len`` the
    length limit L (requires n_unique <= 2**L). Limits beyond MAX_CODE_LEN
    clamp to it: no physical input needs a length > 32 (that would take
    > 2^32 Fibonacci-skewed counts), and nothing downstream (Codebook
    tables, 32-bit decode windows) can represent one. Returns
    (MAX_SYMBOLS,) uint8 lengths, 0 for absent symbols.
    """
    max_len = min(max_len, MAX_CODE_LEN)
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    present = freqs > 0
    n = int(present.sum())
    if n == 0:
        return lengths
    sym = np.flatnonzero(present)
    if n == 1:
        # Degenerate 1-bit code (the reference emits empty output here;
        # SURVEY.md §4).
        lengths[sym] = 1
        return lengths
    if n > (1 << max_len):  # max_len <= 32 after the clamp, so no overflow
        # Infeasible limit: package-merge would silently emit a
        # non-prefix code (Kraft > 1) — fail loudly instead.
        raise ValueError(
            f"max_len={max_len} cannot encode {n} distinct symbols "
            f"(needs >= {int(np.ceil(np.log2(n)))} bits)"
        )
    w = freqs[sym].astype(np.int64)
    order = np.lexsort((sym, w))  # ascending (weight, symbol), like the
    # device's two-key lax.sort
    lengths[sym[order]] = _limit_lengths(
        w[order].astype(np.float64), None, max_len
    ).astype(np.uint8)
    return lengths


@dataclass(frozen=True)
class Codebook:
    """Canonical Huffman codebook plus dense device-friendly tables.

    Attributes
    ----------
    lengths : (MAX_SYMBOLS,) uint8 — code length per symbol, 0 if absent.
    codes : (MAX_SYMBOLS,) uint32 — right-justified canonical codeword.
    sym_order : (n_unique,) uint16 — symbols sorted by (length, symbol);
        i.e. canonical order. ``sym_order[rank]`` inverts encoding.
    lj_limit : (MAX_CODE_LEN,) uint32 — left-justified exclusive upper
        boundary of codes of length l+1; monotone non-decreasing. Boundaries
        of 2^32 (which only occur for l >= max_len) saturate to 0xFFFFFFFF,
        so an all-ones peek can overcount — decode clamps:
        ``len = min(1 + count(peek32 >= lj_limit), max_len)``.
    lj_first : (MAX_CODE_LEN + 1,) uint32 — left-justified first code of
        each length (index by len, entry 0 unused).
    base : (MAX_CODE_LEN + 1,) int64 — ``cum_count_shorter[l] - first_code[l]``
        (int64 because first_code[l] ~ 2^l; device kernels may wrap it to
        uint32 — rank arithmetic is exact mod 2^32)
        so that decode needs no second table gather:
        ``rank = base[len] + (peek32 >> (32 - len))``.
    """

    lengths: np.ndarray
    codes: np.ndarray
    sym_order: np.ndarray
    lj_limit: np.ndarray
    lj_first: np.ndarray
    base: np.ndarray

    @property
    def n_unique(self) -> int:
        return int(self.sym_order.size)

    @property
    def max_len(self) -> int:
        return int(self.lengths.max(initial=0))

    @staticmethod
    def from_lengths(lengths: np.ndarray) -> "Codebook":
        lengths = np.asarray(lengths, dtype=np.uint8)
        if lengths.shape != (MAX_SYMBOLS,):
            raise ValueError("lengths must be a dense MAX_SYMBOLS table")
        present = np.flatnonzero(lengths)
        lens = lengths[present].astype(np.int64)
        order = np.lexsort((present, lens))
        sym_order = present[order].astype(np.uint16)
        sorted_lens = lens[order]

        # Canonical code assignment: first code of each length follows
        # first[l+1] = (first[l] + count[l]) << 1.
        count = np.bincount(sorted_lens, minlength=MAX_CODE_LEN + 1).astype(np.int64)
        first = np.zeros(MAX_CODE_LEN + 2, dtype=np.int64)
        for l in range(1, MAX_CODE_LEN + 1):
            first[l + 1] = (first[l] + count[l]) << 1
        # Kraft check: boundary after the deepest length must close at 2^L.
        # Exception: a single-symbol codebook is deliberately degenerate
        # (one length-1 code), Kraft sum 1/2.
        L = int(sorted_lens.max(initial=0))
        if L and sym_order.size > 1 and (first[L] + count[L]) != (1 << L):
            raise ValueError("code lengths violate the Kraft equality")

        codes = np.zeros(MAX_SYMBOLS, dtype=np.uint32)
        if sym_order.size:
            rank_in_len = np.arange(sym_order.size, dtype=np.int64)
            cum = np.concatenate(([0], np.cumsum(count)))
            rank_in_len -= cum[sorted_lens]
            codes[sym_order] = (first[sorted_lens] + rank_in_len).astype(np.uint32)

        lj_first = np.zeros(MAX_CODE_LEN + 1, dtype=np.uint32)
        lj_limit = np.full(MAX_CODE_LEN, 0xFFFFFFFF, dtype=np.uint32)
        for l in range(1, MAX_CODE_LEN + 1):
            lj_first[l] = (first[l] << (32 - l)) & 0xFFFFFFFF
            bound = (first[l] + count[l]) << (32 - l)
            lj_limit[l - 1] = min(bound, 0xFFFFFFFF)

        base = np.zeros(MAX_CODE_LEN + 1, dtype=np.int64)
        cum = np.concatenate(([0], np.cumsum(count[1:])))
        for l in range(1, MAX_CODE_LEN + 1):
            base[l] = cum[l - 1] - first[l]
        return Codebook(
            lengths=lengths,
            codes=codes,
            sym_order=sym_order,
            lj_limit=lj_limit,
            lj_first=lj_first,
            base=base,
        )

    @staticmethod
    def from_frequencies(freqs: np.ndarray) -> "Codebook":
        return Codebook.from_lengths(code_lengths_from_frequencies(freqs))

    # -- host (NumPy) encode/decode twins of the device kernels -------------

    def encode_symbols_host(self, symbols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Gather (codes, lengths) for a symbol vector. NumPy twin of the
        device gather in ops/encode.py; used by tests and host paths."""
        symbols = np.asarray(symbols, dtype=np.uint16)
        return self.codes[symbols], self.lengths[symbols].astype(np.int64)

    def decode_stream_host(self, words: np.ndarray, start_bit: int, n_symbols: int) -> np.ndarray:
        """Sequential canonical decode of one bitstream (NumPy twin of the
        lane-parallel device decoder; used for tests/reference container)."""
        out = np.empty(n_symbols, dtype=np.uint16)
        words = words.astype(np.uint64)
        padded = np.concatenate([words, np.zeros(2, dtype=np.uint64)])
        pos = start_bit
        lj_limit = self.lj_limit.astype(np.uint64)
        base = self.base
        sym_order = self.sym_order
        for i in range(n_symbols):
            w = pos >> 5
            sh = pos & 31
            window = (padded[w] << np.uint64(32)) | padded[w + 1]
            peek = (window >> np.uint64(32 - sh)) & np.uint64(0xFFFFFFFF)
            length = min(1 + int(np.sum(peek >= lj_limit)), self.max_len)
            rank = base[length] + int(peek >> np.uint64(32 - length))
            out[i] = sym_order[rank]
            pos += length
        return out

    def expected_bits(self, freqs: np.ndarray) -> int:
        """Total payload bits = sum freq * len (optimality invariant)."""
        return int(np.sum(freqs.astype(np.int64) * self.lengths.astype(np.int64)))
