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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_CODE_LEN, MAX_SYMBOLS

LANES = 128

# Sentinel weight for absent symbols / list padding: orders after every real
# weight, and one packaging step keeps it below int32 overflow. A plain
# Python int: a module-level jnp constant would become a leaked tracer if
# this module's first import happened inside a trace.
_INF = 1 << 30


def _pm_kernel(freq_ref, n_ref, len_ref, sym_ref, x_ref, flags_ref, *,
               K: int, max_len: int):
    """Entire boundary package-merge as ONE Mosaic kernel — including the
    initial (weight, symbol) sort (r4b: the XLA two-key sort was ~1 ms of
    the ~1.4 ms that remained after the first kernel version; the full
    in-kernel bitonic sort with a carried symbol payload costs ~136
    vector passes).

    MEASURED MOTIVATION (r4, scripts/exp_merge.py): as an XLA op sequence
    the rounds are dispatch-bound — a 2K-item merge costs ~1.5 ms whether
    K is 8,192 or 65,536 (pure fixed overhead; the full 65,536-cap
    codebook is 19.6 ms with lax.sort rounds, 24.6 with the r3 bitonic
    network). In-kernel the whole list lives in VMEM and every
    compare-swap is a vector op, so all (max_len-1) * log2(2K) passes run
    with no per-pass launch cost.

    Layout: lists are (rows, 128) uint32 keys ``weight<<1 | is_package``,
    row-major (element i at [i // 128, i % 128]). All network passes use
    XOR-partner addressing: for stride k >= 128 the partner row is
    ``row ^ (k/128)`` — two ``pltpu.roll``s over sublanes select it with
    no relayout; for k < 128 the partner is ``lane ^ k`` — one
    ``take_along_axis`` with a static index row (the tile-local lane
    gather every other kernel here already leans on). The per-round
    packaging deinterleaves even/odd elements with two static lane
    gathers + a leading-dim reshape. The merge consumes
    ``[reversed(leaves) ++ packages]`` — descending-then-ascending is
    bitonic — with the constant leaf list reversed ONCE after the sort
    (composed XOR row swaps + one reversed lane gather).

    The leaf sort runs over the FULL dense histogram (absent symbols
    carry the _INF sentinel weight; ties break on the symbol payload, so
    the order is exactly the XLA twin's stable (weight, symbol) two-key
    sort), then the first K ranks feed the rounds. Level flags (the key
    LSBs) land in an int8 VMEM scratch; the backward counting pass (take
    c items at the deepest level, p packages there expand to 2p one
    level down) runs in-kernel too, so the outputs are just the (K,)
    lengths-by-rank and leaf-symbol vectors. Bit-identical to the XLA
    twin below: merge ties carry identical (weight, flag) keys, so any
    stable or unstable merge order yields the same flag sequence.

    DTYPE NOTE (measured r4): Mosaic on the v5e does not legalize
    UNSIGNED vector min/max (`arith.minui` fails to compile — the same
    class of gap as r3's int8 cmpi). The network therefore runs on
    SIGN-BIASED int32 keys (key ^ 0x8000_0000): the bias maps unsigned
    order onto signed order, so the supported smin/smax sort correctly,
    and the flag LSB is untouched. Only the packaging arithmetic unbiases
    (uint32 shifts/adds/compares all legalize — the decode kernel leans
    on them).
    """
    R2 = K // LANES
    R = 2 * R2
    RS = freq_ref.shape[0]  # full-alphabet rows (n_sym / 128)
    bias = jnp.uint32(0x80000000)
    # Biased sentinel: the leaf sentinel key is _INF<<1 = 2^31, which the
    # sign bias maps to exactly 0 (the largest biased value is the
    # package sentinel (2^31+1) ^ bias = 1; every real biased key is
    # negative).
    inf_w = jnp.uint32(_INF)

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    row_r = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (R2, LANES), 1)
    # Static deinterleave index rows: even elements of a row land in the
    # first 64 lanes' worth of pairs ((2c)&127 duplicates the pattern for
    # the upper half, which reads the NEXT row via the reshape select).
    idx_even = (2 * lane_r) & 127
    idx_odd = idx_even + 1

    # ---- in-kernel leaf sort: full bitonic sort of (weight, symbol) ----
    # Weights stay plain positive int32 here (< 2^31: real weights < 2^30,
    # sentinel _INF = 2^30), so signed compares give unsigned order
    # without biasing; the symbol payload rides along and breaks ties —
    # exactly the XLA twin's two-key sort order.
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (RS, LANES), 1)
    row_s = jax.lax.broadcasted_iota(jnp.int32, (RS, LANES), 0)
    glob_s = row_s * LANES + lane_s
    f = freq_ref[:]
    kw = jnp.where(f > 0, f, jnp.int32(_INF))
    sym = glob_s
    N = RS * LANES

    def partner(v, j):
        if j >= LANES:
            d = j // LANES
            lo = (row_s & d) == 0
            return jnp.where(
                lo, pltpu.roll(v, RS - d, 0), pltpu.roll(v, d, 0)
            )
        return jnp.take_along_axis(v, lane_s ^ j, axis=1)

    k = 2
    while k <= N:
        # (for k == N every index has bit k clear: one final ascending merge)
        asc_blk = (glob_s & k) == 0
        j = k // 2
        while j >= 1:
            kp = partner(kw, j)
            sp = partner(sym, j)
            is_lower = (glob_s & j) == 0
            want_small = is_lower == asc_blk
            less = (kw < kp) | ((kw == kp) & (sym < sp))
            sel_self = less == want_small
            kw = jnp.where(sel_self, kw, kp)
            sym = jnp.where(sel_self, sym, sp)
            j //= 2
        k *= 2
    sym_ref[:] = sym[0:R2]

    # Leaf merge keys: biased (w<<1 | 0) of the first K ranks; the merge
    # consumes them REVERSED (descending ++ ascending packages is
    # bitonic) — flip rows by composed XOR block swaps, lanes by a static
    # reversed gather.
    asc_leaves = pltpu.bitcast(
        (pltpu.bitcast(kw[0:R2], jnp.uint32) << 1) ^ bias, jnp.int32
    )
    rev_leaves = asc_leaves
    s = R2 // 2
    while s >= 1:
        lo = (jax.lax.broadcasted_iota(jnp.int32, (R2, LANES), 0) & s) == 0
        rev_leaves = jnp.where(
            lo,
            pltpu.roll(rev_leaves, R2 - s, 0),
            pltpu.roll(rev_leaves, s, 0),
        )
        s //= 2
    rev_leaves = jnp.take_along_axis(rev_leaves, 127 - lane_h, axis=1)

    # Round 1 list: ascending biased leaves ++ sentinel pad (biased 0).
    x_ref[0:R2] = asc_leaves
    x_ref[R2:R] = jnp.zeros((R2, LANES), jnp.int32)

    for rnd in range(max_len - 1):
        xv = x_ref[:]
        w = (pltpu.bitcast(xv, jnp.uint32) ^ bias) >> 1
        # -- package adjacent pairs (deinterleave even/odd, then add) ----
        g_even = jnp.take_along_axis(
            pltpu.bitcast(w, jnp.int32), idx_even, axis=1
        ).reshape(R2, 2, LANES)
        g_odd = jnp.take_along_axis(
            pltpu.bitcast(w, jnp.int32), idx_odd, axis=1
        ).reshape(R2, 2, LANES)
        is_lo = lane_h < 64
        ev = pltpu.bitcast(
            jnp.where(is_lo, g_even[:, 0], g_even[:, 1]), jnp.uint32
        )
        od = pltpu.bitcast(
            jnp.where(is_lo, g_odd[:, 0], g_odd[:, 1]), jnp.uint32
        )
        s = ev + od  # <= 2^31, exact in uint32
        # where(s > INF, INF, s) == min(s, INF); sentinel pairs force INF
        # (matches the XLA twin's pre-add sentinel check bit for bit).
        pk_w = jnp.where(
            (ev >= inf_w) | (od >= inf_w) | (s > inf_w), inf_w, s
        )
        # -- bitonic merge: [rev(leaves) ++ packages], biased domain ------
        x_ref[0:R2] = rev_leaves
        x_ref[R2:R] = pltpu.bitcast(((pk_w << 1) | 1) ^ bias, jnp.int32)
        xv = x_ref[:]
        k = K
        while k >= LANES:  # row-partner passes: partner row = row ^ d
            d = k // LANES
            # pltpu.roll requires a non-negative static shift; R - d is
            # the cyclic equivalent of -d (out[r] = x[r + d]).
            pm = pltpu.roll(xv, R - d, 0)
            pp = pltpu.roll(xv, d, 0)
            low = (row_r & d) == 0
            xv = jnp.where(low, jnp.minimum(xv, pm), jnp.maximum(xv, pp))
            k //= 2
        while k >= 1:  # lane-partner passes: partner lane = lane ^ k
            p = jnp.take_along_axis(xv, lane_r ^ k, axis=1)
            low = (lane_r & k) == 0
            xv = jnp.where(low, jnp.minimum(xv, p), jnp.maximum(xv, p))
            k //= 2
        x_ref[:] = xv
        flags_ref[rnd] = (xv & 1).astype(jnp.int8)  # bias spares the LSB

    # -- backward counting pass --------------------------------------------
    n = n_ref[0, 0]
    c = jnp.maximum(2 * n - 2, 0)
    glob_r = row_r * LANES + lane_r
    glob_h = jax.lax.broadcasted_iota(jnp.int32, (R2, LANES), 0) * LANES + lane_h
    lengths = jnp.zeros((R2, LANES), jnp.int32)
    for l in range(max_len - 1, 0, -1):
        f = flags_ref[l - 1][:].astype(jnp.int32)
        p = jnp.sum(jnp.where(glob_r < c, f, 0))
        m = c - p
        lengths = lengths + (glob_h < m).astype(jnp.int32)
        c = 2 * p
    # level 0 (the leaves list) has no packages: p = 0, m = c.
    lengths = lengths + (glob_h < c).astype(jnp.int32)
    len_ref[:] = lengths


def _pm_pallas(freqs: jax.Array, n: jax.Array, max_len: int, K: int,
               interpret: bool = False):
    """Run the full package-merge kernel (leaf sort included) on a dense
    (n_sym,) int32 histogram; returns ``(lengths_by_rank (K,), leaf_sym
    (K,))`` int32."""
    n_sym = freqs.shape[0]
    R2 = K // LANES
    freq2 = freqs.astype(jnp.int32).reshape(n_sym // LANES, LANES)
    n_row = jnp.zeros((1, LANES), jnp.int32).at[0, 0].set(n.astype(jnp.int32))
    kernel = functools.partial(_pm_kernel, K=K, max_len=max_len)
    out_len, out_sym = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R2, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R2, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * R2, LANES), jnp.int32),
            pltpu.VMEM((max_len - 1, 2 * R2, LANES), jnp.int8),
        ],
        interpret=interpret,
    )(freq2, n_row)
    return out_len.reshape(K), out_sym.reshape(K)


@functools.partial(
    jax.jit, static_argnames=("max_len", "alphabet_cap", "use_kernel")
)
def device_code_lengths(
    freqs: jax.Array,
    max_len: int = MAX_CODE_LEN,
    alphabet_cap: int | None = None,
    use_kernel: bool = False,
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
    # The Pallas kernel's XOR-partner network needs power-of-two lists;
    # rounding the cap UP only widens the exact range (n_unique <=
    # original cap still holds).
    if K & (K - 1):
        K = 1 << K.bit_length()
        K = min(K, n_sym)
    leaf_w = leaf_w[:K]
    # The is-package flag rides as the key's low bit (weights < 2^30, so
    # w<<1|f fits uint32): one single-key merge per round instead of a
    # two-key sort, with identical ordering — leaves win weight ties,
    # like the two-queue's shallow preference reversed; either is optimal.
    leaf_keys = leaf_w.astype(jnp.uint32) << 1
    ranks = jnp.arange(K, dtype=jnp.int32)
    if (use_kernel and K >= LANES * 2 and K % LANES == 0
            and n_sym % LANES == 0 and max_len >= 2):
        # The hot path: leaf sort + all rounds + the counting pass as one
        # Mosaic kernel (bit-identical to the XLA twin below, including
        # its stable (weight, symbol) leaf order — see _pm_kernel). The
        # XLA leaf sort above is dead code on this branch and DCE'd.
        lengths_by_rank, leaf_sym_k = _pm_pallas(freqs, n, max_len, K)
        return _finish_lengths(
            lengths_by_rank, leaf_sym_k, present, ranks, n, n_sym, K
        )
    # Level lists: length 2K (leaves ++ packages), sentinel padded.
    # flags[l][i] == True if item i of level l's list is a package.
    pad = jnp.full((K,), _INF, dtype=jnp.int32)
    level_flags = []
    # Level 1 list is just the leaves.
    cur_w = jnp.concatenate([leaf_w, pad])
    cur_f = jnp.zeros((2 * K,), dtype=jnp.int32)
    level_flags.append(cur_f)
    for _ in range(max_len - 1):
        # Package adjacent pairs; any pair touching a sentinel stays a
        # sentinel (checked BEFORE the add — sentinel + sentinel would
        # overflow int32 and sort first, corrupting the merge).
        a, b = cur_w[0::2], cur_w[1::2]
        pk = jnp.where(
            (a >= _INF) | (b >= _INF), _INF, jnp.minimum(a + b, _INF)
        )
        # Merge sorted leaves with sorted packages by sorting the fused
        # single-key concatenation. MEASURED (r4, scripts/exp_merge.py):
        # the r3 explicit bitonic-merge network LOST to lax.sort at every
        # cap (24.6 vs 19.6 ms full codebook at cap 65536) — at these
        # widths XLA:TPU cost is per-pass dispatch/fusion overhead, not
        # network depth, so fewer/bigger ops win. (The r3-reported 46 ms
        # "cap=32768 anomaly" did not reproduce solo: 13.0 ms, smooth
        # scaling — it was chip-contention contamination.) This XLA path
        # is the interpret/test twin and the max_len>26 tier; the hot
        # tiers run the single-kernel Pallas loop below (use_kernel).
        keys = jax.lax.sort(
            jnp.concatenate([leaf_keys, (pk.astype(jnp.uint32) << 1) | 1])
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

    return _finish_lengths(
        lengths_by_rank, leaf_sym, present, ranks, n, n_sym, K
    )


def _finish_lengths(lengths_by_rank, leaf_sym, present, ranks, n, n_sym, K):
    # Single-symbol alphabet: the counting loop yields length 0 for the
    # lone leaf (c starts at 0); force the degenerate 1-bit code (fixes
    # the reference's silent-empty-output bug, SURVEY.md §4).
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

    # Length-class one-hot, (L+1, n_sym) with the absent class last: one
    # structure feeds the per-length counts, the canonical ranks, AND the
    # within-class prefix counts — replacing r3's unsorted scatter-add +
    # 65,536-element two-key sort (the sort alone measured ~1.5 ms of the
    # 2.27 ms table build, r4 perf_tiers). The class axis is tiny, so
    # every "lookup" is a masked sum over it — no gathers anywhere.
    sort_len = jnp.where(lengths > 0, lengths, jnp.int32(MAX_CODE_LEN + 1))
    C = MAX_CODE_LEN + 1
    cls_ids = jnp.arange(C, dtype=jnp.int32)
    onehot = (
        (sort_len - 1)[None, :] == cls_ids[:, None]
    ).astype(jnp.int32)  # (C, n_sym); class c = length c+1, class L = absent
    totals = jnp.sum(onehot, axis=1)  # (C,)
    counts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), totals[:MAX_CODE_LEN]]
    )  # counts[l] = #codes of length l

    # first[l] = canonical first code of length l: first[l+1] =
    # (first[l] + count[l]) << 1, unrolled at trace time. Values are
    # < 2^l (wrap only touches l = MAX_CODE_LEN entries no code uses).
    first_list = [jnp.uint32(0), jnp.uint32(0)]  # first[0], first[1]
    for l in range(1, MAX_CODE_LEN + 1):
        first_list.append(
            (first_list[l] + counts[l].astype(jnp.uint32)) << jnp.uint32(1)
        )
    first = jnp.stack(first_list[: MAX_CODE_LEN + 1])  # (L+1,)

    # Canonical rank (order by (length, symbol), absent symbols last):
    # rank(s) = #symbols in earlier classes + exclusive prefix count of s
    # within its own class — both straight off the one-hot, selected by a
    # masked sum over the tiny class axis.
    within = jnp.cumsum(onehot, axis=1) - onehot  # exclusive, per class
    class_start = jnp.cumsum(totals) - totals     # exclusive over classes
    sym_rank = jnp.sum(onehot * (within + class_start[:, None]), axis=0)

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
