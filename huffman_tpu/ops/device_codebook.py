"""On-device Huffman codebook construction (the reference's research
kernel, rebuilt TPU-first).

The reference's core contribution is building the Huffman tree *on the
accelerator* in one persistent kernel: per round it packages the two-plus
lightest nodes, merges survivors with a hand-rolled co-ranked parallel
merge, and synchronizes blocks through a grid-wide barrier
(reference: gpuHuffmanConstruction.h:353-466 GenerateCL, :263-351
ParallelMerge, :78-135 Barrier). None of that machinery maps to XLA — there
is no cross-program mutable state, and a pointer-chasing tree walk defeats
the vector units.

The TPU-native equivalent is **boundary package-merge** (Larmore-Hirschberg
via the counting formulation): optimal *length-limited* prefix codes in
L = MAX_CODE_LEN rounds of

    package:  pair adjacent items of the current sorted list
    merge:    merged = sort(leaves ++ packages)   (XLA sort, MXU-free)

followed by a backward counting pass that recovers per-leaf code lengths
from how many items of each level enter the solution. Every step is a
static-shape vector op inside one jit program — rounds are a Python loop
unrolled at trace time (L is a constant), not a dynamic while_loop. With
L = 32 the result equals unrestricted Huffman for every physical input
(an optimal code only exceeds 32 bits with > 2^32 symbols of
Fibonacci-skewed frequencies), so this is both the device twin of the
host two-queue builder and a *stronger* primitive: it handles the
pathological profiles the reference's builder would overflow on
(SURVEY.md §4: code lengths > 255 wrap silently in the reference).

The symbol-side tables (canonical codes, lj boundaries, base offsets) are
assembled on device too, so histogram -> codebook -> encode can run as a
single XLA program with no host round-trip — a capability the reference
lacks (its GPU codebook lands in host std::strings,
gpuHuffmanConstruction.h:562-574).

Weights are int32 with a large-sentinel pad; package sums saturate at
2^30, which is unreachable for per-shard histograms (< 2^30 pairs). The
host builder remains the arbiter for larger aggregate counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import MAX_CODE_LEN, MAX_SYMBOLS

# Sentinel weight for absent symbols / list padding: orders after every real
# weight, and one packaging step keeps it below int32 overflow. A plain
# Python int: a module-level jnp constant would become a leaked tracer if
# this module's first import happened inside a trace.
_INF = 1 << 30


def _bitonic_merge_u32(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sorted merge of two ascending uint32 arrays of equal power-of-two
    length K, as a bitonic MERGE network: log2(2K) elementwise min/max
    passes over the concatenation, vs the O(log^2) full sorting network a
    `lax.sort` of the concatenation would run. Package-merge calls this
    once per round (both its lists arrive sorted: leaves from the initial
    sort, packages because pairwise sums of a sorted list are sorted), so
    the round cost drops from a 2K-item sort to ~log2(2K) vector ops
    (measured r3: full-alphabet codebook 21.7 ms -> see RESULTS.md)."""
    x = jnp.concatenate([a, b[::-1]])  # ascending ++ descending = bitonic
    n = x.shape[0]
    k = n // 2
    while k >= 1:
        y = x.reshape(-1, 2, k)
        lo = jnp.minimum(y[:, 0], y[:, 1])
        hi = jnp.maximum(y[:, 0], y[:, 1])
        x = jnp.stack([lo, hi], axis=1).reshape(n)
        k //= 2
    return x


@functools.partial(jax.jit, static_argnames=("max_len", "alphabet_cap"))
def device_code_lengths(
    freqs: jax.Array,
    max_len: int = MAX_CODE_LEN,
    alphabet_cap: int | None = None,
) -> jax.Array:
    """Optimal length-limited code lengths, entirely on device.

    Parameters
    ----------
    freqs : (MAX_SYMBOLS,) int32/int64 dense histogram.
    max_len : L, the length limit (compile-time constant).
    alphabet_cap : static K; when set, every package-merge round sorts 2K
        items instead of 2*MAX_SYMBOLS (21.7 ms -> 5.3 ms at K=8192 on the
        v5e). The result is exact while n_unique <= K; past that the
        lengths are WRONG — callers must check (e.g. via the fused
        encoder's ``ok`` flag) and rerun uncapped.

    Returns
    -------
    (MAX_SYMBOLS,) int32 code length per symbol, 0 for absent symbols.
    Matches the host two-queue builder's totals (sum freq*len) exactly;
    tie-breaking may differ, which any-optimal canonical coding absorbs.
    """
    freqs = freqs.astype(jnp.int32)
    n_sym = freqs.shape[0]
    present = freqs > 0
    n = jnp.sum(present.astype(jnp.int32))

    # Leaves ascending by (freq, symbol); absent symbols push to the tail
    # as sentinels. Sorting (weight, symbol) pairs keeps ties deterministic.
    leaf_w = jnp.where(present, freqs, _INF)
    sym_ids = jnp.arange(n_sym, dtype=jnp.int32)
    leaf_w, leaf_sym = jax.lax.sort((leaf_w, sym_ids), num_keys=2)

    K = n_sym if alphabet_cap is None else min(alphabet_cap, n_sym)
    # The bitonic merge needs power-of-two lists; rounding the cap UP only
    # widens the exact range (n_unique <= original cap still holds).
    if K & (K - 1):
        K = 1 << K.bit_length()
        K = min(K, n_sym)
    leaf_w = leaf_w[:K]
    # Level lists: length 2K (leaves ++ packages), sentinel padded.
    # flags[l][i] == True if item i of level l's list is a package.
    pad = jnp.full((K,), _INF, dtype=jnp.int32)
    level_flags = []
    # Level 1 list is just the leaves.
    cur_w = jnp.concatenate([leaf_w, pad])
    cur_f = jnp.zeros((2 * K,), dtype=jnp.int32)
    level_flags.append(cur_f)
    # The is-package flag rides as the key's low bit (weights < 2^30, so
    # w<<1|f fits uint32): one single-key merge per round instead of a
    # two-key sort, with identical ordering — leaves win weight ties,
    # like the two-queue's shallow preference reversed; either is optimal.
    leaf_keys = leaf_w.astype(jnp.uint32) << 1
    for _ in range(max_len - 1):
        # Package adjacent pairs; any pair touching a sentinel stays a
        # sentinel (checked BEFORE the add — sentinel + sentinel would
        # overflow int32 and sort first, corrupting the merge).
        a, b = cur_w[0::2], cur_w[1::2]
        pk = jnp.where(
            (a >= _INF) | (b >= _INF), _INF, jnp.minimum(a + b, _INF)
        )
        # Merge sorted leaves with sorted packages. Both lists ARE sorted
        # (leaves from the initial sort; packages because adjacent-pair
        # sums of a sorted list ascend), so a bitonic merge does in
        # log2(2K) min/max passes what `lax.sort` of the concatenation
        # spends a full sorting network on.
        keys = _bitonic_merge_u32(
            leaf_keys, (pk.astype(jnp.uint32) << 1) | 1
        )
        cur_w = (keys >> 1).astype(jnp.int32)
        level_flags.append((keys & 1).astype(jnp.int32))

    # Backward counting pass: take the first c items of the deepest list
    # (c = 2n - 2); p packages among them expand to c = 2p items one level
    # down; the leaves taken at each level are the m = c - p lightest, and
    # length(leaf rank r) = #levels whose m exceeds r.
    lengths_by_rank = jnp.zeros((K,), dtype=jnp.int32)
    c = jnp.maximum(2 * n - 2, 0)
    ranks = jnp.arange(K, dtype=jnp.int32)
    for l in range(max_len - 1, -1, -1):
        flags = level_flags[l]
        in_take = jnp.arange(2 * K, dtype=jnp.int32) < c
        p = jnp.sum(jnp.where(in_take, flags, 0))
        m = c - p
        lengths_by_rank = lengths_by_rank + (ranks < m).astype(jnp.int32)
        c = 2 * p

    # Single-symbol alphabet: the loop yields length 0 for the lone leaf
    # (c starts at 0); force the degenerate 1-bit code (fixes the
    # reference's silent-empty-output bug, SURVEY.md §4).
    lengths_by_rank = jnp.where(
        (n == 1) & (ranks == 0), jnp.int32(1), lengths_by_rank
    )

    # Scatter rank-order lengths back to symbol order.
    lengths = jnp.zeros((n_sym,), dtype=jnp.int32)
    lengths = lengths.at[leaf_sym[:K]].set(lengths_by_rank)
    return jnp.where(present, lengths, 0)


@jax.jit
def device_canonical_tables(lengths: jax.Array):
    """Canonical code tables from a dense length table, on device.

    Device twin of Codebook.from_lengths (codebook.py): returns
    ``(enc_codes, enc_lens, lj_limit, base, sym_rank)`` where

    * ``enc_codes``/``enc_lens`` — (MAX_SYMBOLS,) encode-side gather tables;
    * ``lj_limit`` — (MAX_CODE_LEN,) uint32 left-justified decode boundaries;
    * ``base`` — (MAX_CODE_LEN+1,) uint32 (wrapped mod 2^32, exact for rank
      arithmetic);
    * ``sym_rank`` — (MAX_SYMBOLS,) int32 canonical rank per symbol (the
      inverse of sym_order; scatter it to build the decode permutation).
    """
    # All arithmetic is uint32 with wraparound — x64 is typically disabled
    # under jit, and every consumer (encode gather, decode rank math) is
    # exact mod 2^32. The one saturation case (a code space that closes at
    # exactly 2^32) is detected explicitly.
    lengths = lengths.astype(jnp.int32)
    n_sym = lengths.shape[0]
    counts = jnp.zeros((MAX_CODE_LEN + 2,), jnp.int32).at[lengths].add(
        jnp.where(lengths > 0, 1, 0)
    )
    counts = counts[: MAX_CODE_LEN + 1]  # counts[l] = #codes of length l

    # first[l] = canonical first code of length l: first[l+1] =
    # (first[l] + count[l]) << 1, unrolled at trace time. Values are
    # < 2^l (wrap only touches l = MAX_CODE_LEN entries no code uses).
    first_list = [jnp.uint32(0), jnp.uint32(0)]  # first[0], first[1]
    for l in range(1, MAX_CODE_LEN + 1):
        first_list.append(
            (first_list[l] + counts[l].astype(jnp.uint32)) << jnp.uint32(1)
        )
    first = jnp.stack(first_list[: MAX_CODE_LEN + 1])  # (L+1,)

    # Canonical rank: symbols sorted by (length, symbol); rank via sort.
    sym_ids = jnp.arange(n_sym, dtype=jnp.int32)
    sort_len = jnp.where(lengths > 0, lengths, jnp.int32(MAX_CODE_LEN + 1))
    _, sorted_sym = jax.lax.sort((sort_len, sym_ids), num_keys=2)
    sym_rank = jnp.zeros((n_sym,), jnp.int32).at[sorted_sym].set(sym_ids)

    # rank within its length class = rank - #codes of shorter lengths
    cum_shorter = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[1:])]
    )  # cum_shorter[l] = #codes with length < l (index l >= 1)
    rank_in_len = sym_rank - cum_shorter[jnp.maximum(lengths - 1, 0)]
    enc_codes = first[lengths] + rank_in_len.astype(jnp.uint32)
    enc_codes = jnp.where(lengths > 0, enc_codes, 0)
    enc_lens = lengths

    # Decode boundaries: bound_l = (first[l] + count[l]) << (32 - l),
    # saturated to 0xFFFFFFFF when the code space closes at exactly 2^32
    # (c_l == 2^l; for l == 32 that wraps c to 0, also detected).
    lens_axis = jnp.arange(1, MAX_CODE_LEN + 1, dtype=jnp.uint32)
    c_l = first[1:] + counts[1:].astype(jnp.uint32)
    # At l == 32 a wrapped c of 0 means "exactly 2^32" — unless the
    # codebook is empty, where c is genuinely 0 at every level.
    any_code = jnp.sum(counts[1:]) > 0
    closes = jnp.where(
        lens_axis < 32,
        c_l == (jnp.uint32(1) << lens_axis),
        (c_l == 0) & any_code,
    )
    lj_limit = jnp.where(
        closes, jnp.uint32(0xFFFFFFFF), c_l << (jnp.uint32(32) - lens_axis)
    )
    # base[l] = #codes strictly shorter than l - first[l]  (mod 2^32,
    # exact for rank math); strict prefix = cum_shorter shifted right.
    strict_shorter = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cum_shorter[:-1]]
    )
    base = strict_shorter.astype(jnp.uint32) - first
    return enc_codes, enc_lens, lj_limit, base, sym_rank
