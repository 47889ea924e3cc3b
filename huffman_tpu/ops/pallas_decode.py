"""Pallas TPU kernel: lane-parallel Huffman decode over interleaved streams.

This is the capability the reference lacks entirely (its decoder is a
sequential CPU tree walk, Decompressor.cu:259-291) and the performance core
of the framework.

**Why interleaved streams.** A TPU has no per-lane random access to HBM,
and XLA's generic gather tops out near 0.1 Gelem/s (measured on v5e) — far
below a multi-GB/s target. What IS fast is Mosaic's tile-local dynamic
gather along the lane dimension (~100 Gelem/s measured). So the container
interleaves the 1024 per-block bitstreams of a *group* in exactly the order
the decoder consumes 32-bit words — the encoder can compute that order in
advance by simulating the decoder (a trick from interleaved entropy-coder
design). The decoder then reads ONE sequential stream; at each step, the
lanes that drained their buffer take the next words in lane order, and the
only non-sequential access left is a gather from a small sliding window,
served by the tile-local lane gather.

**Decode protocol** (one step decodes one symbol in each of 1024 lanes; the
encoder simulation in container/interleave.py must match it bit for bit):

1. ``peek = bufA`` — the 64-bit buffer ``bufA:bufB`` is kept left-justified
   at the bit cursor with >= 33 valid bits at every step start.
2. canonical length: ``len = min(1 + count(peek >= lj_limit[i]), max_len)``
   (31 broadcast compares against scalar boundaries).
3. ``rank = base[len] + (peek >> (32-len))`` (u32-wrap exact);
   ``symbol = sym_order[rank]`` by tile-local gather for alphabets up to
   GATHER_MAX_ALPHABET, otherwise the kernel emits ranks and the caller
   translates.
4. shift the buffer left by ``len``; every lane left with < 33 bits refills
   exactly one 32-bit word: its stream slot is ``head + prefix-rank`` of
   the refill mask (prefix scan on the MXU via a strictly-lower-triangular
   ones matmul), fetched from a 2048-word window sliced at ``head``.

Initial state: words 0 and 1 of every lane occupy the first 2*1024 stream
words (lane-major). Pad lanes (>= the real block count) start with a huge
bit counter so they never take stream words — padding costs nothing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as _constants
from ..constants import MAX_CODE_LEN

LANES = 128
SUBLANES = 8                    # sublane rows per decode chain; the group
                                # size derives from it (tune via scripts/)
GROUP_LANES = SUBLANES * LANES  # streams per decode chain
# The protocol constants are format-defining and live in constants.py (so
# host-only code reads them without jax); the kernel re-exports them and
# asserts its geometry matches.
PRELOAD_WORDS = _constants.PRELOAD_WORDS
WINDOW_ROWS = _constants.WINDOW_ROWS
REFILL_THRESHOLD = _constants.REFILL_THRESHOLD
assert GROUP_LANES == _constants.GROUP_LANES, (
    "constants.GROUP_LANES must track the kernel group size"
)
assert WINDOW_ROWS == SUBLANES + 1  # max refill slot is 127 + GROUP_LANES
# In-kernel rank->symbol translation limit (4 packed table rows; larger
# alphabets emit ranks and the caller translates in-jit with the packed
# PAIR-gather kernel, which pipelines as its own grid instead of riding
# the serial decode chain). MEASURED r5 (32 MiB zipf, K=80,
# in-kernel(multi=3) vs rank(multi=4), scripts/exp_rank_boundary.py +
# perflogs/r5_rank_boundary_*.log): A=300 12.96 vs 11.80, 1000 13.20 vs
# 11.58, 2000 11.86 vs 12.12, 3000 11.54 vs 12.34, silesia ~4k 10.68 vs
# 12.08 GB/s — the r4b 4096 boundary rested on an UNMEASURED "tiny
# tables are near-free on-chain" theory that the silesia A/B falsified
# (+13% headline decode from moving it). The crossover sits between 4
# and 8 symtab rows; 1024 keeps genuinely tiny alphabets (bytes-like
# corpora, <= 4 rows) on the single-kernel path. Env override for the
# perf harness to re-probe.
GATHER_MAX_ALPHABET = int(
    os.environ.get("HTPU_GATHER_MAX_ALPHABET", "1024")
)
DEFAULT_MULTI = 4               # independent groups interleaved per kernel
                                # instance: the per-chain step is a serial
                                # dependency chain, so extra chains fill
                                # the VPU's latency bubbles. The r2 tuning
                                # (multi 2/3/4 = 9.6/10.8/9.2 — 3 won) was
                                # taken on a 16-ROW symtab; since the r5
                                # boundary move translate mode only serves
                                # <= 4-row symtabs, where the shorter
                                # chain hides one more chain (r5, 32 MiB:
                                # text300 m3/4/5/6 = 12.41/15.47/14.32/
                                # 11.92; text1k 13.80/14.57/11.47/10.38 —
                                # perflogs/r5_multi32_text*.log)
DEFAULT_MULTI_RANK = 4          # rank mode drops the in-kernel symtab
                                # gather, shortening the serial chain —
                                # it hides one more chain (measured r4,
                                # 16 MiB/30k zipf: multi 2/3/4/5/6 =
                                # 4.20/4.25/4.72/4.13/4.45 GB/s)
DEFAULT_MULTI_RANK_SMALL = 5    # silesia-class rank decode (the r5
                                # headline path) hides one chain more
                                # still: 32 MiB silesia (3969 unique,
                                # max_len 16) multi 3/4/5/6 =
                                # 11.46/12.33/12.84/11.88 GB/s. NOT a
                                # general small-alphabet rule: at 2000
                                # unique (max_len 15) 5 LOSES (m4/m5 =
                                # 12.36/11.03), as it does at 30k/60k
                                # (5.69/5.30, 3.46/3.27) — the extra
                                # chain only pays on the deeper-codebook
                                # mid band; perflogs/r5_multi32_*.log


def default_multi(translate: bool, n_symbols: int | None = None) -> int:
    """The shipping chain-interleave width for a decode mode.

    ``n_symbols`` (the rank-tier alphabet size, when known) selects the
    rank width: 5 on the (2048, 4096] band, 4 elsewhere — measured at
    the 2000/3969/30000/60000 endpoints (perflogs/r5_multi32_*.log);
    the cut inside the unmeasured (2000, 3969) gap sits at 2048."""
    if translate:
        return DEFAULT_MULTI
    if n_symbols is not None and 2048 < n_symbols <= 4096:
        return DEFAULT_MULTI_RANK_SMALL
    return DEFAULT_MULTI_RANK

# Perf-ablation knobs (scripts/perf_decode.py): comma-separated names in
# HTPU_ABLATE disable kernel pieces AT TRACE TIME to attribute step cost.
# Output is wrong under ablation — never set outside perf experiments.
_ABLATE = frozenset(
    x for x in os.environ.get("HTPU_ABLATE", "").split(",") if x
)


def build_symtab(sym_order: np.ndarray):
    """Pack the canonical symbol permutation for the in-kernel gather.

    Symbols are 16-bit, so two pack into each i32 table word — halving the
    unrolled gather depth. Returns (symtab (rows*128,) int32, rows,
    translate); translate is False for alphabets past GATHER_MAX_ALPHABET,
    where the kernel emits ranks for the caller to translate.
    """
    n = int(sym_order.size)
    if not (0 < n <= GATHER_MAX_ALPHABET):
        return np.zeros(LANES, np.int32), 1, False
    n_pack = (n + 1) // 2
    # Exact rows: the in-kernel select tree rides the SERIAL decode
    # chain, so pow2 padding (a 12k alphabet costs 64 rows instead of
    # 47) was pure chain latency. Mirrors the r4b translate-pass change
    # (_pack_rows_for).
    rows = max(1, (n_pack + LANES - 1) // LANES)
    even = np.zeros(n_pack, np.uint32)
    odd = np.zeros(n_pack, np.uint32)
    so = sym_order.astype(np.uint32)
    even[: (n + 1) // 2] = so[0::2]
    odd[: n // 2] = so[1::2]
    packed = np.zeros(rows * LANES, np.uint32)
    packed[:n_pack] = even | (odd << 16)
    return packed.view(np.int32), rows, True


def _pack_rows_for(n_symbols: int) -> int:
    """Rows (of 128 words, two 16-bit entries each) for the TRANSLATE-PASS
    packed-16 table holding ``n_symbols`` entries, rounded up to 2-row
    granularity (min 16). The pair-gather's select tree costs ~linearly
    in rows, so pow2 bucketing wasted up to ~2x tree depth (a 30k
    alphabet needs 118 rows; pow2 padded it to 128). 2-row steps track
    the exact need (measured r4: 118 vs 120 rows = 2.447 vs 2.467 ms /
    16 MiB); one stream set uses one alphabet size, so the extra
    compile-shape classes cost nothing in practice."""
    n_pack = (n_symbols + 1) // 2
    rows = (n_pack + LANES - 1) // LANES
    return max(16, (rows + 1) // 2 * 2)


def _lane_gather_i32(rows: jax.Array, idx: jax.Array) -> jax.Array:
    """rows.reshape(-1)[idx] for rows (R,128) int32 and idx (8,128) int32
    with values < R*128. Each row is a native per-element lane gather
    (~35 Gelem/s measured); the row results combine through a BALANCED
    select tree — a linear where-chain makes the dependency depth R, which
    dominates at 32-row symbol tables.

    The tree selects on the BITS of the row index: level k pairs nodes
    whose leaf ranges differ exactly in bit k, so ONE predicate per level
    (ceil(log2 R) total) replaces the per-node range compare (R-1 of
    them) a midpoint tree needs — at 120-row tables that is ~30% of the
    whole gather's vector ops (measured r4: the wide-alphabet translate
    pass 2.48 -> 1.68 ms / 16 MiB). A trailing odd node passes through
    unpaired; that is exact for any in-range index because a node's leaf
    range is a bit-aligned block."""
    r = idx >> 7
    m = idx & 127
    nodes = [
        jnp.take_along_axis(
            jnp.broadcast_to(rows[q][None, :], idx.shape), m, axis=1
        )
        for q in range(rows.shape[0])
    ]
    k = 0
    while len(nodes) > 1:
        bit = (r & (1 << k)) != 0
        nodes = [
            jnp.where(bit, nodes[q + 1], nodes[q])
            if q + 1 < len(nodes)
            else nodes[q]
            for q in range(0, len(nodes), 2)
        ]
        k += 1
    return nodes[0]


def _prefix_rank(mask: jax.Array, tril128: jax.Array):
    """Exclusive prefix count of mask (8,128) in lane-id order
    (id = sublane*128 + lane) plus the total, via MXU row scan + a 3-step
    doubling fold over sublanes."""
    m = mask.astype(jnp.float32)
    within = jax.lax.dot_general(
        m, tril128, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    row_tot = jnp.broadcast_to(
        jnp.sum(m, axis=1, keepdims=True), mask.shape
    )  # (rows,128) float
    if "fold" in _ABLATE:
        # v3 ceiling probe (HTPU_ABLATE=fold): per-128-lane-row refill
        # domains would need no cross-sublane fold — rank within the row
        # only. Output is WRONG; cost model for the protocol-v3 analysis
        # (CLAUDE.md parked ideas / VERDICT r2 weak #2).
        total = jnp.sum(m).astype(jnp.int32)
        return within, total
    sub = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    inc = row_tot
    sh = 1
    while sh < mask.shape[0]:  # doubling fold over sublane rows
        rolled = pltpu.roll(inc, sh, 0)
        inc = inc + jnp.where(sub >= sh, rolled, 0.0)
        sh <<= 1
    row_off = (inc - row_tot).astype(jnp.int32)  # exclusive over sublanes
    total = jnp.sum(m).astype(jnp.int32)
    return within + row_off, total


def _decode_kernel(
    meta_ref,      # scalar-prefetch (ngroups, 4) i32: [n_real, 0, 0, 0]
    lj_ref,        # scalar-prefetch (MAX_CODE_LEN,) i32 (u32 boundary bits)
    stream_ref,    # VMEM (multi*stream_rows, 128) u32 — interleaved words
    base_ref,      # VMEM (1, 128) u32 (base table padded into one row)
    symtab_ref,    # VMEM (sym_rows, 128) i32 canonical symbol permutation
    out_ref,       # VMEM (multi*n_steps, 8, 128) i32 symbols (or ranks)
    *,
    n_steps: int,
    max_len: int,
    translate: bool,
    multi: int,
    stream_rows: int,
    min_len: int = 1,
):
    # max_len and translate are compile-time codebook properties: the length
    # loop unrolls to exactly max_len-1 compares (not MAX_CODE_LEN-1) and
    # the rank->symbol gather is traced in or out entirely. `multi`
    # independent groups are decoded in one interleaved loop — each chain's
    # step is a long serial dependency chain, so the extra chains fill the
    # VPU's latency bubbles at no extra VMEM-bandwidth cost.
    g = pl.program_id(0)

    shape = (SUBLANES, LANES)
    lane_id = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )

    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tril128 = (li < lj).astype(jnp.float32)  # strictly lower: earlier lanes

    base_row = jnp.broadcast_to(
        pltpu.bitcast(base_ref[0:1, :], jnp.int32), shape
    )

    def init(j):
        r0 = j * stream_rows
        n_real = meta_ref[g * multi + j, 0]
        is_pad = lane_id >= n_real
        bufA0 = stream_ref[r0 : r0 + SUBLANES, :]
        bufB0 = stream_ref[r0 + SUBLANES : r0 + 2 * SUBLANES, :]
        bits0 = jnp.where(is_pad, jnp.int32(1 << 30), jnp.int32(64))
        return bufA0, bufB0, bits0, jnp.int32(PRELOAD_WORDS * GROUP_LANES)

    def chain_step(j, t, carry):
        bufA, bufB, bits, head = carry
        if "floor" in _ABLATE:
            # absolute floor probe: loop + store + one add, nothing else
            return pltpu.bitcast(bufA, jnp.int32), (
                bufA + jnp.uint32(1), bufB, bits, head
            )
        peek = bufA

        # No code is shorter than min_len, so boundaries below it are
        # never crossed — start the canonical length search there. The
        # compares are mutually independent (peek vs scalar boundaries);
        # summing them as a balanced tree keeps the dependency chain at
        # log2 depth instead of one long serial accumulate.
        hi = max_len - 1 if "len1" not in _ABLATE else min_len
        terms = [
            # lj bits stored as i32; value-wrap to u32 restores the boundary
            (peek >= lj_ref[i].astype(jnp.uint32)).astype(jnp.int32)
            for i in range(min_len - 1, hi)
        ]
        terms.append(jnp.full(shape, min_len, jnp.int32))
        while len(terms) > 1:
            terms = [
                terms[k] + terms[k + 1] if k + 1 < len(terms) else terms[k]
                for k in range(0, len(terms), 2)
            ]
        length = terms[0]

        if "base" in _ABLATE:
            base_v = length
        else:
            base_v = jnp.take_along_axis(base_row, length, axis=1)
        rank = base_v + pltpu.bitcast(
            peek >> ((32 - length).astype(jnp.uint32)), jnp.int32
        )
        if translate and "sym" in _ABLATE:
            sym = rank
        elif translate:
            # Table words hold two 16-bit symbols (build_symtab): gather
            # the pair word, select the half by rank parity.
            pair = _lane_gather_i32(
                symtab_ref[:],
                jnp.clip(rank >> 1, 0, symtab_ref.shape[0] * LANES - 1),
            )
            half = pltpu.bitcast(pair, jnp.uint32) >> (
                ((rank & 1) << 4).astype(jnp.uint32)
            )
            sym = pltpu.bitcast(half & jnp.uint32(0xFFFF), jnp.int32)
        else:
            sym = rank
        emit = sym

        # consume
        sh = length.astype(jnp.uint32)
        inv = (jnp.uint32(32) - sh) & jnp.uint32(31)
        full = length == 32
        bufA = jnp.where(full, bufB, (bufA << sh) | (bufB >> inv))
        # sh == 0 impossible (length >= 1); inv == 0 only when full.
        bufB = jnp.where(full, jnp.uint32(0), bufB << sh)
        bits = bits - length

        # refill
        mask = bits < REFILL_THRESHOLD
        if "rank" in _ABLATE:
            k, total = jnp.zeros(shape, jnp.int32), jnp.int32(1)
        else:
            k, total = _prefix_rank(mask, tril128)
        if "window" in _ABLATE:
            window = pltpu.bitcast(
                stream_ref[j * stream_rows : j * stream_rows + WINDOW_ROWS, :],
                jnp.int32,
            ) + head
        elif "win2" in _ABLATE:
            # v3 ceiling probe: per-row refill domains bound each row's
            # window to <= 2 stream rows (<= 128 refills per row-step +
            # cursor slack), so the gather select tree collapses 9 -> 2
            # leaves. Output is WRONG (shared head, not per-row); cost
            # model only — pair with HTPU_ABLATE=fold for the full v3
            # ceiling.
            window = pltpu.bitcast(
                stream_ref[pl.ds(j * stream_rows + (head >> 7), 2), :],
                jnp.int32,
            )
        else:
            window = pltpu.bitcast(
                stream_ref[pl.ds(j * stream_rows + (head >> 7), WINDOW_ROWS), :],
                jnp.int32,
            )
        slot = (head & 127) + k
        if "win2" in _ABLATE:
            slot = slot & 255
        if "gather" in _ABLATE:
            word = pltpu.bitcast(window[0:SUBLANES, :] + slot, jnp.uint32)
        else:
            word = pltpu.bitcast(_lane_gather_i32(window, slot), jnp.uint32)
        word = jnp.where(mask, word, jnp.uint32(0))
        bpos = bits.astype(jnp.uint32)  # in [1, 32] for refilling lanes
        addA = jnp.where(bpos < 32, word >> (bpos & jnp.uint32(31)), jnp.uint32(0))
        addB = jnp.where(
            bpos == 32, word, word << ((jnp.uint32(32) - bpos) & jnp.uint32(31))
        )
        bufA = jnp.where(mask, bufA | addA, bufA)
        bufB = jnp.where(mask, bufB | addB, bufB)
        bits = bits + jnp.where(mask, 32, 0)
        head = head + total
        return emit, (bufA, bufB, bits, head)

    half = n_steps // 2

    def body(tp, carries):
        # Two protocol steps per iteration; the two 16-bit symbols pack
        # into one output word. The store was measured at ~1/3 of the whole
        # step on v5e — halving its bytes is the single biggest win.
        new = []
        for j in range(multi):
            s0, c = chain_step(j, 2 * tp, carries[j])
            s1, c = chain_step(j, 2 * tp + 1, c)
            if "out" not in _ABLATE:
                out_ref[j * half + tp] = (s0 & 0xFFFF) | (s1 << 16)
            else:
                c = (c[0], c[1], c[2] + jnp.minimum(s0 + s1, 0), c[3])
            new.append(c)
        return tuple(new)

    jax.lax.fori_loop(0, half, body, tuple(init(j) for j in range(multi)))
    # NOTE (measured r4, 16 MiB/30k/multi=4): translating rank pairs as
    # an in-kernel POST-pass over the VMEM-resident output block measured
    # 4.37 GB/s vs 4.94 for the SEPARATE pair-gather kernel — the bulk
    # pass pipelines its own grid while this kernel's next group decodes,
    # whereas a post-loop appends pure serial VPU time to every grid
    # step. Rank translation therefore stays a separate pass
    # (gather_u16_pairs_pallas); per-STEP in-kernel translation at 128
    # rows is worse still (3.02 — it lands on the serial decode chain).


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_steps", "stream_rows", "sym_rows", "max_len", "translate",
        "multi", "min_len", "interpret", "packed_out",
    ),
)
def decode_groups(
    streams: jax.Array,   # (ngroups * stream_rows, 128) uint32
    lj_limit: jax.Array,  # (MAX_CODE_LEN,) uint32
    base: jax.Array,      # (MAX_CODE_LEN + 1,) uint32
    symtab: jax.Array,    # (sym_rows * 128,) int32
    meta: jax.Array,      # (ngroups, 4) int32: [n_real, 0, 0, 0]
    n_steps: int,
    stream_rows: int,
    sym_rows: int,
    max_len: int = MAX_CODE_LEN,
    translate: bool = True,
    multi: int | None = None,  # None = default_multi(translate)
    min_len: int = 1,
    interpret: bool = False,
    sym_order_dev: jax.Array | None = None,  # (n,) int32 rank -> symbol
    packed_out: bool = False,
) -> jax.Array:
    """Decode all groups; returns (ngroups * n_steps, 8, 128) int32 where
    row g*n_steps+t holds step t of group g (lane (s,l) = block
    g*1024 + s*128 + l). n_steps must be even (the kernel emits packed
    16-bit symbol pairs to halve its store traffic).

    For alphabets past GATHER_MAX_ALPHABET the kernel emits canonical
    ranks; passing ``sym_order_dev`` (with ``translate=False``) applies the
    rank -> symbol permutation as an XLA gather INSIDE the same program, so
    no host-side translation loop remains even at the full 65,536-symbol
    alphabet (the reference decodes its 65,289-symbol JPEG end-to-end,
    Compressor.cu:385; measured cost: scripts/perf_decode.py --alphabet)."""
    if n_steps % 2:
        raise ValueError("n_steps (block_symbols) must be even")
    ngroups = streams.shape[0] // stream_rows
    lj_i32 = jax.lax.bitcast_convert_type(lj_limit, jnp.int32)
    base_pad = jnp.zeros((1, LANES), jnp.uint32).at[0, : MAX_CODE_LEN + 1].set(base)
    symtab2 = symtab.reshape(sym_rows, LANES)

    # Pad the group count to a multiple of `multi` with empty groups
    # (n_real = 0 lanes never consume stream words).
    if multi is None:
        multi = default_multi(
            translate,
            None if translate or sym_order_dev is None
            else int(sym_order_dev.shape[0]),
        )
    multi = max(1, min(multi, max(ngroups, 1)))
    pad_g = (-ngroups) % multi
    if pad_g:
        streams = jnp.concatenate(
            [streams, jnp.zeros((pad_g * stream_rows, LANES), streams.dtype)]
        )
        meta = jnp.concatenate(
            [meta, jnp.zeros((pad_g, meta.shape[1]), meta.dtype)]
        )
    ngroups_p = ngroups + pad_g

    kernel = functools.partial(
        _decode_kernel, n_steps=n_steps, max_len=max_len, translate=translate,
        multi=multi, stream_rows=stream_rows,
        min_len=max(1, min(min_len, max_len)),
    )
    half = n_steps // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # meta, lj
        grid=(ngroups_p // multi,),
        in_specs=[
            pl.BlockSpec(
                (multi * stream_rows, 128), lambda g, *_: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, LANES), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sym_rows, 128), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (multi * half, SUBLANES, LANES), lambda g, *_: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    packed = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ngroups_p * half, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(meta, lj_i32, streams, base_pad, symtab2)
    if packed_out:
        # The packed pairs ARE the final 16-bit symbol stream: word h of
        # lane (s,l) holds steps 2h, 2h+1 — consecutive block symbols in
        # little-endian u16 order. Callers assembling byte output reorder
        # (g, half, 8, 128) -> (g, 8, 128, half) and view as '<u2',
        # skipping the 2x unpack/repack shuffle entirely. Rank-tier
        # alphabets (translate=False) translate the packed RANK pairs
        # in-program with the pair-gather kernel — both halves of every
        # word look up the packed-16 symbol table directly, so the rank
        # tier never unpacks to one-rank-per-word at all (r4; the prior
        # path unpacked 2x, gathered per-element, then repacked).
        if not translate:
            if sym_order_dev is None or not sym_order_dev.size:
                # Packed words hold canonical RANKS; shipping them as the
                # symbol stream would be silent corruption.
                raise ValueError(
                    "packed_out with translate=False requires sym_order_dev"
                )
            n = sym_order_dev.shape[0]
            if interpret:
                u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
                so = sym_order_dev.astype(jnp.uint32)
                s0 = jnp.take(so, (u & 0xFFFF).astype(jnp.int32), mode="clip")
                s1 = jnp.take(so, (u >> 16).astype(jnp.int32), mode="clip")
                packed = jax.lax.bitcast_convert_type(
                    s0 | (s1 << 16), jnp.int32
                )
            else:
                from .pallas_gather import gather_u16_pairs_pallas

                rows = _pack_rows_for(n)
                so = sym_order_dev.astype(jnp.uint32)
                even = jnp.zeros((rows * LANES,), jnp.uint32).at[
                    : (n + 1) // 2
                ].set(so[0::2])
                odd = jnp.zeros((rows * LANES,), jnp.uint32).at[: n // 2].set(
                    so[1::2]
                )
                packed = gather_u16_pairs_pallas(packed, even | (odd << 16))
        out = packed.reshape(ngroups_p, half, SUBLANES, LANES)
        return out[:ngroups] if pad_g else out

    # Unpack the 16-bit symbol pairs back to one row per step (fused XLA
    # pass over the output, ~free next to the kernel itself).
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    pair = jnp.stack(
        [(u & 0xFFFF).astype(jnp.int32), (u >> 16).astype(jnp.int32)], axis=1
    )  # (G*half, 2, 8, 128)
    out = pair.reshape(ngroups_p, half, 2, SUBLANES, LANES).reshape(
        ngroups_p * n_steps, SUBLANES, LANES
    )
    if not translate and sym_order_dev is not None and sym_order_dev.size:
        if interpret:
            out = jnp.take(sym_order_dev.astype(jnp.int32), out, mode="clip")
        else:
            # Dense packed-16 Pallas gather for the unpacked layout.
            from .pallas_gather import gather_u16_pallas

            n = sym_order_dev.shape[0]
            rows = _pack_rows_for(n)
            so = sym_order_dev.astype(jnp.uint32)
            even = jnp.zeros((rows * LANES,), jnp.uint32).at[: (n + 1) // 2].set(
                so[0::2]
            )
            odd = jnp.zeros((rows * LANES,), jnp.uint32).at[: n // 2].set(
                so[1::2]
            )
            out = gather_u16_pallas(
                jnp.clip(out, 0, n - 1), even | (odd << 16)
            )
    return out[: ngroups * n_steps] if pad_g else out
