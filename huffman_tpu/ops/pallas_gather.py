"""Pallas TPU gather structures: fast table lookups the hardware lacks.

XLA's generic per-element gather runs at ~0.27 Gelem/s on the v5e
(61.5 ms for a 16 MiB input's 8.4M byte-pair symbols — it was the
largest encode stage by far); Mosaic's tile-local LANE gather is ~two
orders faster when the table fits VMEM rows. The reference reads its
tables with one global-memory load per element (Compressor.cu:50-61); a
TPU needs a structure. This module provides four, by key shape:

* ``gather_rank_select`` — succinct dictionary for SPARSE 16-bit keys
  with a known alphabet: rank = cum[sym>>5] + popcount(maskword below),
  payload from a dense rank-ordered table. Fully-vectorized build (used
  by the fused all-device encoder); 3.7 ms / 8.4M lookups.
* ``gather_table_pallas`` — row-displacement compressed table
  (Tarjan/Yao) for the same keys; the build is a sequential first-fit
  pack, done on the host (numpy twin + native C htpu_disp_pack, ~3 ms).
  Used by the container path where the codebook lives on the host.
* ``gather_u16_pallas`` — DENSE 16-bit-payload tables, two entries per
  word (the decoder's large-alphabet rank->symbol translation pass).
* ``gather_packed32_dense`` — dense full-alphabet 32-bit payloads as two
  packed-16 gathers (the exact any-alphabet encode tier).

Aliasing of absent keys is harmless by construction: every codebook
derives from the data's own histogram, so symbols outside the alphabet
cannot occur on real steps (padding is masked downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_SYMBOLS
from .pallas_decode import LANES, SUBLANES, _lane_gather_i32

# Packed-table slot buckets (rows of 128 each): the smallest that packs
# wins; each bucket is one kernel shape class. Multi-entry rows need the
# load kept low-ish (a 16-entry row fails w.h.p. past ~50% occupancy), so
# the builder escalates. Alphabets that fit none fall back to XLA.
SLOT_BUCKETS = (2048, 4096, 8192, 16384)


def _pack_rows(values, present, n_slots):
    counts = present.sum(axis=1)
    order = np.argsort(-counts, kind="stable")
    occupied = np.zeros(n_slots, dtype=bool)
    disp = np.zeros(256, dtype=np.int32)
    table = np.zeros(n_slots, dtype=np.uint32)
    max_d = n_slots - 256
    for hi in order:
        mask = present[hi]
        if not mask.any():
            continue
        los = np.flatnonzero(mask)
        # Candidate displacements: only those placing the first (anchor)
        # element onto a currently-free slot — equivalent to first-fit but
        # O(free-slot candidates) instead of O(n_slots) per row.
        anchor = int(los[0])
        cand = np.flatnonzero(~occupied[anchor : anchor + max_d + 1])
        placed = False
        # Structured alphabets (e.g. ASCII text) give many hi rows nearly
        # identical lo-sets, so scalar first-fit degenerates; test
        # candidate displacements in vectorized batches instead.
        for c0 in range(0, cand.size, 512):
            chunk = cand[c0 : c0 + 512]
            hits = occupied[chunk[:, None] + los[None, :]].any(axis=1)
            ok = np.flatnonzero(~hits)
            if ok.size:
                d = int(chunk[ok[0]])
                occupied[d + los] = True
                disp[hi] = d
                table[d + los] = values[hi, los]
                placed = True
                break
        if not placed:
            return None
    return disp, table


def build_displacement_table(
    values: np.ndarray,      # (65536,) uint32 payload per symbol
    present: np.ndarray,     # (65536,) bool — symbols that can occur
):
    """First-fit-decreasing row displacement packing into the smallest
    slot bucket that fits.

    Returns (disp (256,) int32, table (n_slots,) uint32) or None when the
    alphabet does not pack (caller falls back to the XLA gather).
    """
    values = np.asarray(values, dtype=np.uint32).reshape(256, 256)
    present = np.asarray(present, dtype=bool).reshape(256, 256)
    n = int(present.sum())
    if n == 0:
        return None

    native_pack = None
    try:
        from ..runtime import native

        if native.available():
            native_pack = native.disp_pack
    except ImportError:
        pass

    for n_slots in SLOT_BUCKETS:
        # Keep multi-entry-row failure odds low: past ~45% load the dense
        # rows stop fitting and the scan wastes time before failing.
        if n > n_slots * 0.45 and n_slots != SLOT_BUCKETS[-1]:
            continue
        if n > n_slots:
            continue
        if native_pack is not None:
            r = native_pack(values, present, n_slots)
            if r is NotImplemented:  # stale library without the symbol
                native_pack = None
                r = _pack_rows(values, present, n_slots)
        else:
            r = _pack_rows(values, present, n_slots)
        if r is not None:
            return r
    return None


# NOTE (measured negative, r2): an ON-DEVICE first-fit displacement pack
# was built as a 256-round fori_loop with per-row 1-D conv collision scans
# and measured ~140 ms — tiny sequential XLA convs cost ~550 us each on
# this chip. The rank-select structure below replaced it: its build is
# fully vectorized (bit-pack + cumsum + one monotone scatter) and serves
# the fused all-device encoder; the host/native FFD pack above serves the
# container path.


def _gather_kernel(disp_ref, table_ref, sym_ref, out_ref, *, n_tiles: int):
    """sym/out: (n_tiles, 8, 128) i32; disp: (2, 128) i32; table:
    (rows, 128) i32."""
    for t in range(n_tiles):
        sym = sym_ref[t]
        hi = (sym >> 8) & 0xFF
        lo = sym & 0xFF
        d = _lane_gather_i32(disp_ref[:], hi)
        slot = jnp.clip(d + lo, 0, table_ref.shape[0] * LANES - 1)
        out_ref[t] = _lane_gather_i32(table_ref[:], slot)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_table_pallas(
    symbols: jax.Array,   # any shape, int32 values in [0, 65536)
    disp: jax.Array,      # (256,) int32
    table: jax.Array,     # (n_slots,) uint32, n_slots % 128 == 0 (static bucket)
    interpret: bool = False,
) -> jax.Array:
    """Table lookup ``table_expanded[symbols]`` through the displacement
    pair; returns uint32 in the symbols' shape. ~15x the XLA gather
    (measured: 61.5 ms -> ~4 ms per 8.4M symbols on the v5e)."""
    shape = symbols.shape
    flat = symbols.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tile = SUBLANES * LANES
    # Tiles per grid cell: enough to amortize pipeline startup, small
    # enough to keep blocks modest (256 KiB in + 256 KiB out at 64). The
    # interpreter pays per unrolled op — keep its graphs small.
    per_cell = 8 if interpret else 64
    chunk = tile * per_cell
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // chunk
    grid_sym = flat.reshape(cells * per_cell, SUBLANES, LANES)

    disp_pad = jnp.zeros((2 * LANES,), jnp.int32).at[:256].set(
        disp.astype(jnp.int32)
    ).reshape(2, LANES)
    rows = table.shape[0] // LANES
    table2 = jax.lax.bitcast_convert_type(table, jnp.int32).reshape(rows, LANES)

    kernel = functools.partial(_gather_kernel, n_tiles=per_cell)
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((2, LANES), lambda g: (0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (cells * per_cell, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(disp_pad, table2, grid_sym)
    flat_out = jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)
    return flat_out[:n].reshape(shape)


# ---------------------------------------------------------------------------
# Rank-select gather: the succinct-dictionary formulation.
#
# The displacement scheme above needs a sequential first-fit pack (fine on
# the host: htpu_disp_pack ~3 ms; hopeless on device: 256 dependent rounds
# measured ~140 ms as XLA convs). The rank-select structure removes the
# build problem entirely: rank(sym) = cum[sym>>5] + popcount(mask[sym>>5]
# below sym&31), then one lane-gather from the DENSE rank-ordered payload
# table. Build = bit-pack + cumsum + one monotone scatter — fully
# vectorized, identical on device and host.
# ---------------------------------------------------------------------------

RANK_WORDS = MAX_SYMBOLS // 32  # 2048 mask words = 16 rows of 128


def default_per_cell(rows: int) -> int:
    """Tiles per grid cell for the dense-table gathers, by table rows.

    Measured (r4c sweep, perflogs/r4c_exp_rank_gather.log, 16 MiB zipf,
    K>=30): big tables want SMALL cells (the unrolled select tree makes
    each tile's op count scale with rows, so a 512-row cell at per_cell 64
    is a huge serial program that starves the pipeline: 11.35 ms vs 10.20
    at per_cell 32), small tables want big cells (pipeline startup
    dominates: cap 4096 prefers 128, 3.06 vs 3.09 ms). The decoder's
    pair-translate sweep agrees at ~120 rows (per_cell 32/64/128/256 =
    2.50/2.48/2.78/2.64 ms). Per-cap, this replaces the old global 64
    (VERDICT r4 weak #3)."""
    if rows <= 32:
        return 128
    if rows <= 256:
        return 64
    return 32


def build_rank_select(values, present, cap: int = 8192):
    """(maskwords (2048,) uint32, cums (2048,) int32, dense (cap,) uint32,
    ok). Works on jnp arrays (inside jit, device) and numpy arrays alike.
    ``ok`` is False when the alphabet exceeds ``cap`` (dense ranks past the
    table are clipped — output garbage, caller must check)."""
    xp = jnp if isinstance(values, jax.Array) else np
    present_i = present.astype(xp.uint32).reshape(RANK_WORDS, 32)
    weights = (
        xp.uint32(1) << xp.arange(32, dtype=xp.uint32)
    )[None, :]
    maskwords = (present_i * weights).sum(axis=1, dtype=xp.uint32)
    counts = present_i.sum(axis=1, dtype=xp.int32)
    cums = xp.cumsum(counts, dtype=xp.int32) - counts  # exclusive
    n = counts.sum(dtype=xp.int32)
    # rank[sym] = exclusive prefix count of present over all symbols
    rank = xp.cumsum(present.astype(xp.int32)) - present.astype(xp.int32)
    if xp is jnp:
        # Monotone scatter-ADD: every symbol (present or not) routes to
        # min(rank, cap-1) — absent symbols contribute value 0 at a valid
        # in-order position (an end-of-table sentinel between real indices
        # would silently corrupt sorted scatters on real TPUs; CLAUDE.md).
        dense = jnp.zeros((cap,), jnp.uint32).at[
            jnp.minimum(rank, cap - 1)
        ].add(
            jnp.where(present, values.astype(jnp.uint32), 0),
            mode="drop", indices_are_sorted=True,
        )
        ok = n <= cap
    else:
        dense = np.zeros((cap,), np.uint32)
        sel = np.flatnonzero(present)[:cap]
        dense[rank[sel]] = values[sel]
        ok = bool(n <= cap)
    return maskwords, cums, dense, ok


def _rank_gather_kernel(mask_ref, cum_ref, dense_ref, sym_ref, out_ref,
                       *, n_tiles: int):
    """mask/cum: (16, 128) i32; dense: (cap/128, 128) i32;
    sym/out: (n_tiles, 8, 128) i32."""
    cap = dense_ref.shape[0] * LANES
    for t in range(n_tiles):
        sym = sym_ref[t]
        w = (sym >> 5) & (RANK_WORDS - 1)
        b = sym & 31
        mw = _lane_gather_i32(mask_ref[:], w)
        cm = _lane_gather_i32(cum_ref[:], w)
        below = pltpu.bitcast(
            (jnp.uint32(1) << b.astype(jnp.uint32)) - jnp.uint32(1), jnp.int32
        )
        rank = cm + jax.lax.population_count(mw & below)
        out_ref[t] = _lane_gather_i32(
            dense_ref[:], jnp.clip(rank, 0, cap - 1)
        )


@functools.partial(jax.jit, static_argnames=("interpret", "per_cell"))
def gather_rank_select(
    symbols: jax.Array,    # any shape, int32 values in [0, 65536)
    maskwords: jax.Array,  # (2048,) uint32
    cums: jax.Array,       # (2048,) int32
    dense: jax.Array,      # (cap,) uint32, cap % 128 == 0 (static bucket)
    interpret: bool = False,
    per_cell: int | None = None,
) -> jax.Array:
    """Succinct-dictionary table lookup; returns uint32 in symbols' shape.
    Valid only for symbols marked present in the build (absent symbols
    alias arbitrary entries — the codebook derives from the data's own
    histogram, so they cannot occur on real steps)."""
    shape = symbols.shape
    flat = symbols.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tile = SUBLANES * LANES
    if per_cell is None:
        per_cell = 8 if interpret else default_per_cell(dense.shape[0] // LANES)
    chunk = tile * per_cell
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // chunk
    grid_sym = flat.reshape(cells * per_cell, SUBLANES, LANES)

    mask2 = jax.lax.bitcast_convert_type(maskwords, jnp.int32).reshape(
        RANK_WORDS // LANES, LANES
    )
    cum2 = cums.astype(jnp.int32).reshape(RANK_WORDS // LANES, LANES)
    rows = dense.shape[0] // LANES
    dense2 = jax.lax.bitcast_convert_type(dense, jnp.int32).reshape(rows, LANES)

    kernel = functools.partial(_rank_gather_kernel, n_tiles=per_cell)
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((RANK_WORDS // LANES, LANES), lambda g: (0, 0)),
            pl.BlockSpec((RANK_WORDS // LANES, LANES), lambda g: (0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (cells * per_cell, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(mask2, cum2, dense2, grid_sym)
    flat_out = jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)
    return flat_out[:n].reshape(shape)


# ---------------------------------------------------------------------------
# Canonical-rank gather: the two-level wide-alphabet encode structure.
#
# gather_rank_select stores the full 32-bit ``len<<26|code`` per present
# symbol, so its dense table is cap/128 rows and the unrolled select tree
# is LINEAR in rows — 512 leaf gathers at cap 65536 (the measured
# full-alphabet encode wall, VERDICT r4 missing #3). But canonical codes
# are ARITHMETIC in the canonical rank: with ``base[l] = start[l] -
# first[l]`` (the decode table, device_codebook.py — decode computes
# ``rank = base[len] + peek >> (32-len)``; this is that identity run
# backwards), ``code = canon_rank - base[len] (mod 2^32)`` and ``len`` is
# a step function of canon_rank (canon order sorts by length first). So
# the dense payload only needs the 16-BIT canonical rank — two per word,
# HALF the rows (256 at cap 65536) — plus max_len-1 compares against
# scalar class boundaries and one 33-entry row gather. Net ops per tile at
# cap 65536: ~(16+16+256+~20) vs ~(16+16+512); measured r5:
# 10.20 -> 5.74 ms / 16 MiB (and 6.37 -> 3.86 at cap 32768).
# ---------------------------------------------------------------------------


def _rank_canon_kernel(
    start_ref,   # scalar-prefetch (MAX_CODE_LEN+1,) i32: #codes len < l
    mask_ref,    # VMEM (16, 128) i32 presence mask words
    cum_ref,     # VMEM (16, 128) i32 exclusive word counts
    canon_ref,   # VMEM (cap/256, 128) i32 packed-16 canonical ranks
    base_ref,    # VMEM (1, 128) i32 (u32 bits): start[l] - first[l]
    sym_ref,     # VMEM (n_tiles, 8, 128) i32 symbols
    out_ref,     # VMEM (n_tiles, 8, 128) i32 packed len<<26|code
    *,
    n_tiles: int,
    max_len: int,
    identity_rank: bool,
):
    cap2 = canon_ref.shape[0] * LANES
    shape = (SUBLANES, LANES)
    base_row = jnp.broadcast_to(base_ref[0:1, :], shape)
    for t in range(n_tiles):
        sym = sym_ref[t]
        if identity_rank:
            # Full-alphabet tier: the dense table covers EVERY symbol
            # slot (canon16 is sym_rank itself, packed), so the succinct
            # rank stage (32 row gathers + popcount) vanishes.
            rank = sym
        else:
            w = (sym >> 5) & (RANK_WORDS - 1)
            b = sym & 31
            mw = _lane_gather_i32(mask_ref[:], w)
            cm = _lane_gather_i32(cum_ref[:], w)
            below = pltpu.bitcast(
                (jnp.uint32(1) << b.astype(jnp.uint32)) - jnp.uint32(1),
                jnp.int32,
            )
            rank = cm + jax.lax.population_count(mw & below)
        pair = _lane_gather_i32(
            canon_ref[:], jnp.clip(rank >> 1, 0, cap2 - 1)
        )
        canon = pltpu.bitcast(
            (pltpu.bitcast(pair, jnp.uint32) >> ((rank & 1) << 4).astype(
                jnp.uint32
            )) & jnp.uint32(0xFFFF),
            jnp.int32,
        )
        # Canonical length: canon_rank lands in [start[len], start[len+1]).
        # start is non-decreasing, so len = 1 + #boundaries <= canon_rank —
        # the decode kernel's length search, on ranks instead of peek bits.
        # Tree-sum keeps the dependency depth logarithmic.
        terms = [
            (canon >= start_ref[l]).astype(jnp.int32)
            for l in range(2, max_len + 1)
        ]
        terms.append(jnp.full(shape, 1, jnp.int32))
        while len(terms) > 1:
            terms = [
                terms[k] + terms[k + 1] if k + 1 < len(terms) else terms[k]
                for k in range(0, len(terms), 2)
            ]
        length = terms[0]
        base_v = jnp.take_along_axis(base_row, length, axis=1)
        code = pltpu.bitcast(
            pltpu.bitcast(canon, jnp.uint32) - pltpu.bitcast(base_v, jnp.uint32),
            jnp.int32,
        )
        out_ref[t] = (length << 26) | code


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "interpret", "per_cell", "identity_rank"),
)
def gather_rank_canonical(
    symbols: jax.Array,    # any shape, int32 values in [0, 65536)
    maskwords: jax.Array,  # (2048,) uint32
    cums: jax.Array,       # (2048,) int32
    canon16: jax.Array,    # (cap/2,) uint32 packed-16 canonical ranks
    start: jax.Array,      # (MAX_CODE_LEN+1,) int32: #codes with len < l
    base: jax.Array,       # (MAX_CODE_LEN+1,) uint32 decode base table
    max_len: int,
    interpret: bool = False,
    per_cell: int | None = None,
    identity_rank: bool = False,
) -> jax.Array:
    """``len<<26|code`` per symbol via rank -> canonical-rank -> arithmetic
    canonical coding; returns uint32 in symbols' shape. Same contract as
    gather_rank_select over a packed-code table (bit-identical output,
    pinned by tests), at half the dense rows. Valid only for symbols
    present in the build (absent symbols alias arbitrary entries; callers
    mask on validity downstream, as with every gather here).

    ``identity_rank=True`` (full-alphabet tier): canon16 must be the
    sym_rank table itself packed two-per-word over ALL 65,536 slots; the
    succinct rank stage is skipped entirely (maskwords/cums unread)."""
    shape = symbols.shape
    flat = symbols.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tile = SUBLANES * LANES
    rows = canon16.shape[0] // LANES
    if identity_rank and rows != MAX_SYMBOLS // 2 // LANES:
        raise ValueError("identity_rank requires a full 65,536-slot table")
    if per_cell is None:
        # Canon-specific sweep (perflogs/r5_rank_canon*.log, 16 MiB,
        # K=40): 64-row tables want BIG cells (cap 16384: per_cell
        # 256/128 = 4.350/4.356 ms vs 4.429 at 16), 128+-row tables want
        # 32 (cap 32768: 5.174 at 32 vs 5.271 at 64; cap 65536: 7.137 at
        # 32 vs 7.267 at 64) — the packed mapping's trend, shifted by the
        # canon kernel's fixed per-tile compare cost.
        per_cell = 8 if interpret else (128 if rows <= 64 else 32)
    chunk = tile * per_cell
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // chunk
    grid_sym = flat.reshape(cells * per_cell, SUBLANES, LANES)

    mask2 = jax.lax.bitcast_convert_type(maskwords, jnp.int32).reshape(
        RANK_WORDS // LANES, LANES
    )
    cum2 = cums.astype(jnp.int32).reshape(RANK_WORDS // LANES, LANES)
    canon2 = jax.lax.bitcast_convert_type(
        canon16.astype(jnp.uint32), jnp.int32
    ).reshape(rows, LANES)
    base_pad = jnp.zeros((LANES,), jnp.uint32).at[: base.shape[0]].set(base)
    base2 = jax.lax.bitcast_convert_type(base_pad, jnp.int32).reshape(1, LANES)

    kernel = functools.partial(
        _rank_canon_kernel, n_tiles=per_cell, max_len=max_len,
        identity_rank=identity_rank,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec(
                (RANK_WORDS // LANES, LANES), lambda g, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RANK_WORDS // LANES, LANES), lambda g, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, LANES), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (per_cell, SUBLANES, LANES), lambda g, *_: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (cells * per_cell, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(start.astype(jnp.int32), mask2, cum2, canon2, base2, grid_sym)
    flat_out = jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)
    return flat_out[:n].reshape(shape)


# ---------------------------------------------------------------------------
# Dense u16 gather: rank -> symbol translation for 16K-64K alphabets.
#
# Decode past GATHER_MAX_ALPHABET emits canonical ranks; ranks are DENSE in
# [0, n), so translation is a straight dense-table lookup — the only
# obstacle is table size (65,536 entries). Two 16-bit symbols pack per
# word, giving <= 256 VMEM rows; as a separate embarrassingly-parallel
# pass the deep lane-gather tree pipelines at full VPU issue rate
# (measured 16x faster than the in-jit XLA gather this replaces).
# ---------------------------------------------------------------------------


def _u16_gather_kernel(table_ref, idx_ref, out_ref, *, n_tiles: int):
    rows = table_ref.shape[0]
    for t in range(n_tiles):
        idx = idx_ref[t]
        pair = _lane_gather_i32(
            table_ref[:], jnp.clip(idx >> 1, 0, rows * LANES - 1)
        )
        half = pltpu.bitcast(pair, jnp.uint32) >> (
            ((idx & 1) << 4).astype(jnp.uint32)
        )
        out_ref[t] = pltpu.bitcast(half & jnp.uint32(0xFFFF), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_u16_pallas(
    indices: jax.Array,   # any shape, int32 in [0, 2*rows*128)
    packed16: jax.Array,  # (m,) int32/uint32 — value i at word i>>1, half i&1
    interpret: bool = False,
) -> jax.Array:
    """Dense 16-bit-table lookup; returns int32 values in indices' shape."""
    shape = indices.shape
    flat = indices.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tile = SUBLANES * LANES
    per_cell = 8 if interpret else 32
    chunk = tile * per_cell
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // chunk
    grid_idx = flat.reshape(cells * per_cell, SUBLANES, LANES)
    rows = packed16.shape[0] // LANES
    table2 = jax.lax.bitcast_convert_type(
        packed16.astype(jnp.uint32), jnp.int32
    ).reshape(rows, LANES)
    kernel = functools.partial(_u16_gather_kernel, n_tiles=per_cell)
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (cells * per_cell, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(table2, grid_idx)
    return jax.lax.bitcast_convert_type(out, jnp.uint32).reshape(-1)[
        :n
    ].astype(jnp.int32).reshape(shape)


def _u16_pair_gather_kernel(table_ref, idx_ref, out_ref, *, n_tiles: int):
    """Like _u16_gather_kernel, but each input word holds TWO 16-bit
    indices (lo, hi) and each output word the two looked-up 16-bit values
    in the same halves — the decoder's packed symbol-pair layout."""
    rows = table_ref.shape[0]
    for t in range(n_tiles):
        u = pltpu.bitcast(idx_ref[t], jnp.uint32)
        halves = []
        for shift in (0, 16):
            # u >> 16 needs no mask; indices are non-negative by
            # construction, so the bounds clamp is a single min.
            half_u = u & jnp.uint32(0xFFFF) if shift == 0 else u >> 16
            idx = pltpu.bitcast(half_u, jnp.int32)
            pair = _lane_gather_i32(
                table_ref[:], jnp.minimum(idx >> 1, rows * LANES - 1)
            )
            val = pltpu.bitcast(pair, jnp.uint32) >> (
                ((idx & 1) << 4).astype(jnp.uint32)
            )
            halves.append(val & jnp.uint32(0xFFFF))
        out_ref[t] = pltpu.bitcast(halves[0] | (halves[1] << 16), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "per_cell"))
def gather_u16_pairs_pallas(
    packed_idx: jax.Array,  # any shape, i32 words = lo_idx | hi_idx<<16
    packed16: jax.Array,    # (m,) int32/uint32 — value i at word i>>1, half i&1
    interpret: bool = False,
    per_cell: int | None = None,
) -> jax.Array:
    """Dense 16-bit-table lookup of BOTH halves of packed index words;
    returns packed value words in the input's shape. Used by the decoder's
    rank tier: the kernel's packed rank pairs translate to packed symbol
    pairs without ever unpacking to one-rank-per-word (half the traffic of
    gather_u16_pallas on the unpacked ranks, and the 2x-size XLA
    unpack/repack pass disappears entirely)."""
    shape = packed_idx.shape
    flat = packed_idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    tile = SUBLANES * LANES
    if per_cell is None:
        per_cell = (
            8 if interpret else default_per_cell(packed16.shape[0] // LANES)
        )
    chunk = tile * per_cell
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // chunk
    grid_idx = flat.reshape(cells * per_cell, SUBLANES, LANES)
    rows = packed16.shape[0] // LANES
    table2 = jax.lax.bitcast_convert_type(
        packed16.astype(jnp.uint32), jnp.int32
    ).reshape(rows, LANES)
    kernel = functools.partial(_u16_pair_gather_kernel, n_tiles=per_cell)
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((per_cell, SUBLANES, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (cells * per_cell, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(table2, grid_idx)
    return out.reshape(-1)[:n].reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_packed32_dense(
    symbols: jax.Array,   # any shape, int32 in [0, MAX_SYMBOLS)
    table: jax.Array,     # (MAX_SYMBOLS,) uint32 payload per symbol
    interpret: bool = False,
) -> jax.Array:
    """Dense full-alphabet 32-bit table lookup as TWO packed-16 Pallas
    gathers (hi/lo halves of every entry, each half a 256-row packed
    table). The exact tier for alphabets past the rank-select caps:
    ~15 ms / 8.4M symbols vs 61.5 ms for XLA's per-element gather."""
    lo = gather_u16_pallas(
        symbols,
        (table[0::2] & 0xFFFF) | ((table[1::2] & 0xFFFF) << 16),
        interpret=interpret,
    )
    hi = gather_u16_pallas(
        symbols,
        (table[0::2] >> 16) | ((table[1::2] >> 16) << 16),
        interpret=interpret,
    )
    return (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
