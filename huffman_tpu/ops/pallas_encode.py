"""Pallas TPU kernels: lane-parallel Huffman bit-packing (encode).

The pack kernel packs the way the decoder decodes: one block per vector
lane, a 32-bit staging word per lane, one symbol per step — the
reference's encoder walks '0'/'1' strings per bit (Compressor.cu:182-313);
here every step is a handful of vector shifts. Because max code length
<= 32, at most ONE word completes per lane per step, so completed words
land in a dense (step, lane) staging grid with no lane scatter.

Stream assembly (staging -> interleaved payload) has two formulations:
``pack_streams_pallas`` compacts with one monotone sorted scatter driven
by a reverse lookahead scan (2.5 ms / 16 MiB measured — the monotone index
stream lowers to a fast path on the v5e), and
``pack_streams_kernel_deposit`` does the deposit inside a backward-walking
Pallas kernel (scatter-free; slower here, kept as the protocol reference
for in-kernel deposits). Measured encode walls, in order
(scripts/perf_encode.py, iters >= 30): the symbol->code XLA gather
(~60 ms / 16 MiB), then everything else at single-digit ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import (
    GROUP_LANES,
    LANES,
    PRELOAD_WORDS,
    SUBLANES,
    WINDOW_ROWS,
)


def _pack_kernel(codes_ref, lens_ref, out_ref, *, n_steps: int,
                 multi: int = 1):
    """codes/lens: (multi*n_steps, 8, 128) step-major symbol tiles for
    ``multi`` groups; out: (multi*(n_steps+1), 8, 128) staging — row
    j*(n_steps+1)+t holds group j's word completed at step t (0 if none),
    row j*(n_steps+1)+n_steps its final partial word (left-aligned).

    ``multi`` interleaves independent groups in one loop, decode-`multi`
    style: the per-lane (buf, fill) carry is a serial dependency chain, so
    extra chains fill the VPU's latency bubbles at no extra traffic.
    """
    shape = (SUBLANES, LANES)

    def chain_step(j, t, carry):
        buf, f = carry  # partial word (top f bits valid), fill count
        c = codes_ref[j * n_steps + t]
        L = lens_ref[j * n_steps + t]
        total = f + L
        tot_u = total.astype(jnp.uint32)
        # Bits of c placed after the f valid bits of a 64-bit window:
        # the high half ORs into buf, the low half becomes the new buf.
        fits = total <= 32
        addA = jnp.where(
            fits,
            c << ((jnp.uint32(32) - tot_u) & jnp.uint32(31)),
            c >> ((tot_u - jnp.uint32(32)) & jnp.uint32(31)),
        )
        addA = jnp.where(L == 0, jnp.uint32(0), addA)
        word = buf | addA
        emit = total >= 32
        out_ref[j * (n_steps + 1) + t] = pltpu.bitcast(
            jnp.where(emit, word, jnp.uint32(0)), jnp.int32
        )
        spill = jnp.where(
            total > 32,
            c << ((jnp.uint32(64) - tot_u) & jnp.uint32(31)),
            jnp.uint32(0),
        )
        buf = jnp.where(emit, spill, word)
        f = total & 31
        return buf, f

    def body(t, carries):
        return tuple(
            chain_step(j, t, carries[j]) for j in range(multi)
        )

    carries = jax.lax.fori_loop(
        0, n_steps, body,
        tuple(
            (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.int32))
            for _ in range(multi)
        ),
    )
    for j in range(multi):
        out_ref[j * (n_steps + 1) + n_steps] = pltpu.bitcast(
            carries[j][0], jnp.int32
        )


def _to_grid(a: jax.Array) -> jax.Array:
    """(n_lanes, K) lane-major -> (ngroups*K, 8, 128) step-major tiles (the
    layout every encode kernel consumes)."""
    n_lanes, K = a.shape
    ngroups = n_lanes // GROUP_LANES
    return (
        a.reshape(ngroups, SUBLANES, LANES, K)
        .transpose(0, 3, 1, 2)
        .reshape(ngroups * K, SUBLANES, LANES)
    )


# Staging-chain interleave width (decode-DEFAULT_MULTI analog). 1 until a
# chip measurement justifies more — flip after scripts/perf_encode.py
# shows a win (the staging wall is ~1.7 ms / 16 MiB, so the ceiling is
# small but nonzero).
DEFAULT_STAGING_MULTI = 1


def _staging_grid(codes: jax.Array, lens: jax.Array, interpret: bool,
                  multi: int = DEFAULT_STAGING_MULTI) -> jax.Array:
    """Run the pack kernel; returns staging (ngroups*(B+1), 8, 128) int32 in
    grid layout — tile t holds the words completed at step t, tile B the
    final left-aligned partial words. ``multi`` interleaves that many
    groups per kernel instance (padding with zero groups; sliced off)."""
    nblocks, B = codes.shape
    ngroups = nblocks // GROUP_LANES
    multi = max(1, min(multi, max(ngroups, 1)))
    cg = _to_grid(codes.astype(jnp.uint32))
    lg = _to_grid(lens.astype(jnp.int32))
    pad_g = (-ngroups) % multi
    if pad_g:
        cg = jnp.concatenate(
            [cg, jnp.zeros((pad_g * B, SUBLANES, LANES), cg.dtype)]
        )
        lg = jnp.concatenate(
            [lg, jnp.zeros((pad_g * B, SUBLANES, LANES), lg.dtype)]
        )
    ngroups_p = ngroups + pad_g
    kernel = functools.partial(_pack_kernel, n_steps=B, multi=multi)
    out = pl.pallas_call(
        kernel,
        grid=(ngroups_p // multi,),
        in_specs=[
            pl.BlockSpec((multi * B, SUBLANES, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((multi * B, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (multi * (B + 1), SUBLANES, LANES), lambda g: (g, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ngroups_p * (B + 1), SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(cg, lg)
    return out[: ngroups * (B + 1)] if pad_g else out


def _staging(codes: jax.Array, lens: jax.Array, interpret: bool,
             multi: int = DEFAULT_STAGING_MULTI) -> jax.Array:
    """Pack-kernel staging in (lane, step) order (nblocks, B+1) uint32."""
    nblocks, B = codes.shape
    ngroups = nblocks // GROUP_LANES
    return (
        jax.lax.bitcast_convert_type(
            _staging_grid(codes, lens, interpret, multi), jnp.uint32
        )
        .reshape(ngroups, B + 1, GROUP_LANES)
        .transpose(0, 2, 1)
        .reshape(nblocks, B + 1)
    )


@functools.partial(jax.jit, static_argnames=("words_cap", "interpret"))
def pack_streams_kernel_deposit(
    codes: jax.Array,     # (n_lanes, B) uint32 codewords (0 on garbage steps)
    eff_lens: jax.Array,  # (n_lanes, B) int32 PROTOCOL lengths (garbage steps
                          # carry min_len with code 0 — docs/FORMATS.md §3)
    n_real: jax.Array,    # scalar int32 real lane count
    words_cap: int,
    interpret: bool = False,
):
    """Pack + interleave with the deposit done INSIDE a backward Pallas
    kernel (no XLA scatter; device twin of
    container/interleave.build_interleaved_streams).

    Kept as an alternate formulation: measured 9.6 ms vs the sorted
    scatter's 2.5 ms per 16 MiB on the v5e (the scatter's monotone
    index stream lowers well; the kernel's per-step inverse-rank search
    does not beat it). The backward-walk protocol derivation documented
    here is load-bearing for the fused encoder's in-kernel deposit work.

    Key identity (docs/FORMATS.md §3): with one bit-cumsum driving both
    sides, the decoder consumes word j at the same step the encoder
    completes word j-2 (both fire when cum crosses 32*(j-1)), so the value
    landing at each consumption slot is the word completed TWO FIRES LATER
    in the same lane. The deposit kernel walks steps backward, where that
    word is simply the second-most-recent completion — a two-deep carry.
    Returns (streams (ngroups, 2048 + cap') uint32, counts); cap' is
    words_cap rounded up to a whole number of (8,128) tiles.

    ``words_cap`` must bound EVERY group's body words (counts[g] - 2048),
    not the average. B * GROUP_LANES is always safe; callers with
    host-visible bit totals can size it exactly and verify via the
    returned counts."""
    n_lanes, B = codes.shape
    ngroups = n_lanes // GROUP_LANES

    st_grid = _staging_grid(codes, eff_lens, interpret)

    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    real = (lane < n_real)[:, None]
    cum = jnp.where(real, jnp.cumsum(eff_lens.astype(jnp.int32), axis=1), 0)
    r = cum >> 5
    r_prev = jnp.concatenate(
        [jnp.zeros((n_lanes, 1), jnp.int32), r[:, :-1]], axis=1
    )
    fires = r > r_prev  # fire indicator (emission AND consumption, shifted)

    # Pack fire bits 32 steps per word (bit t&31 of word t>>5) so the
    # deposit kernel's mask input is 32x smaller than the staging.
    mb = (B + 31) // 32
    pad = mb * 32 - B
    indp = jnp.pad(fires, ((0, 0), (0, pad))).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    mask_bits = (indp.reshape(n_lanes, mb, 32) * weights).sum(
        axis=2, dtype=jnp.uint32
    )
    mask_grid = _to_grid(jax.lax.bitcast_convert_type(mask_bits, jnp.int32))

    body_words = jnp.sum(
        (cum[:, -1] >> 5).reshape(ngroups, GROUP_LANES), axis=1
    ).astype(jnp.int32)

    streams = deposit_streams_pallas(
        st_grid, mask_grid, body_words, words_cap, interpret
    )
    return streams, body_words + PRELOAD_WORDS * GROUP_LANES


@functools.partial(
    jax.jit, static_argnames=("words_cap", "interpret", "staging_multi")
)
def pack_streams_pallas(
    codes: jax.Array,     # (n_lanes, B) uint32 codewords (0 on garbage steps)
    eff_lens: jax.Array,  # (n_lanes, B) int32 PROTOCOL lengths (garbage steps
                          # carry min_len with code 0 — docs/FORMATS.md §3)
    n_real: jax.Array,    # scalar int32 real lane count
    words_cap: int,
    interpret: bool = False,
    staging_multi: int = DEFAULT_STAGING_MULTI,
):
    """Pack + interleave in one pass: Pallas packer -> XLA reverse
    lookahead scan -> ONE sorted deposit scatter (device twin of
    container/interleave.build_interleaved_streams fed by the same eff
    lengths). 2.5 ms per 16 MiB at tight caps on the v5e — the monotone
    index stream lowers to a fast path; round 1's 85 ms came from the
    worst-case words_cap zero-buffer, not the scatter itself.

    Key identity (docs/FORMATS.md §3): with one bit-cumsum driving both
    sides, the decoder consumes word j at the same step the encoder
    completes word j-2 (both fire when cum crosses 32*(j-1)), so the value
    landing at each consumption slot is the word completed TWO FIRES LATER
    in the same lane — a reverse lookahead scan keeps the deposit scatter
    monotone. ``words_cap`` must bound EVERY group's body words."""
    n_lanes, B = codes.shape
    ngroups = n_lanes // GROUP_LANES

    st = _staging(codes, eff_lens, interpret, staging_multi)  # (n_lanes, B+1)

    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    real = (lane < n_real)[:, None]
    cum = jnp.where(real, jnp.cumsum(eff_lens.astype(jnp.int32), axis=1), 0)
    r = cum >> 5
    r_prev = jnp.concatenate(
        [jnp.zeros((n_lanes, 1), jnp.int32), r[:, :-1]], axis=1
    )
    ind = r - r_prev  # fire indicator (emission AND consumption, shifted)

    # Word completed two fires later, per fire slot (reverse scan). The
    # carry seeds are the words consumed by the final two fires: the last
    # fire reads past the payload (zero garbage), the second-to-last reads
    # the lane's final left-aligned PARTIAL word (staging row B).
    def back(carry, x):
        v1, v2 = carry
        fired, word = x
        out = jnp.where(fired, v2, 0)
        v2n = jnp.where(fired, v1, v2)
        v1n = jnp.where(fired, word, v1)
        return (v1n, v2n), out

    zeros = jnp.zeros((n_lanes,), jnp.uint32)
    _, v2later = jax.lax.scan(
        back, (st[:, B], zeros),
        (ind.T > 0, st[:, :B].T),
        reverse=True,
    )  # (B, n_lanes)

    # Consumption-slot positions: exclusive (step-major, lane-minor) cumsum
    # per group, offset past the preload words.
    ind_g = (
        ind.reshape(ngroups, GROUP_LANES, B)
        .transpose(0, 2, 1)
        .reshape(ngroups, B * GROUP_LANES)
    )
    incl = jnp.cumsum(ind_g, axis=1)
    pos = incl - ind_g
    counts = incl[:, -1]
    goff = jnp.arange(ngroups, dtype=jnp.int32)[:, None] * words_cap
    vals = (
        v2later.reshape(B, ngroups, GROUP_LANES)
        .transpose(1, 0, 2)
        .reshape(ngroups, B * GROUP_LANES)
    )
    body = jnp.zeros(ngroups * words_cap, dtype=jnp.uint32)
    body = body.at[(pos + goff).reshape(-1)].add(
        jnp.where(ind_g > 0, vals, 0).reshape(-1),
        mode="drop", indices_are_sorted=True,
    ).reshape(ngroups, words_cap)

    # Preload: each lane's first two stream words (fires 0 and 1); a lane
    # whose bit total never crosses the 32/64 boundary supplies its final
    # left-aligned partial word (staging row B) there instead.
    ge32 = cum >= 32
    ge64 = cum >= 64
    t0 = jnp.argmax(ge32, axis=1)[:, None]
    t1 = jnp.argmax(ge64, axis=1)[:, None]
    partial = st[:, B:]
    has32 = ge32.any(axis=1, keepdims=True)
    has64 = ge64.any(axis=1, keepdims=True)
    w0 = jnp.where(
        has32, jnp.take_along_axis(st[:, :B], t0, axis=1), partial
    )
    w1 = jnp.where(
        has64,
        jnp.take_along_axis(st[:, :B], t1, axis=1),
        jnp.where(has32, partial, 0),
    )
    pre = (
        jnp.concatenate([w0, w1], axis=1)      # (n_lanes, 2)
        .reshape(ngroups, GROUP_LANES, PRELOAD_WORDS)
        .transpose(0, 2, 1)
        .reshape(ngroups, PRELOAD_WORDS * GROUP_LANES)
    )
    streams = jnp.concatenate([pre, body], axis=1)
    return streams, counts + PRELOAD_WORDS * GROUP_LANES


def _deposit_step(values: jax.Array, fired: jax.Array, tril128: jax.Array,
                  win_pos: jax.Array, off: jax.Array):
    """Compact ``values`` of ``fired`` lanes (8,128) into consumption-slot
    order and lay them over a (WINDOW_ROWS,128) window starting ``off``
    words in. Returns (contribution, valid-slot mask, total fires).

    Row-decomposed inverse rank: ``take_along_axis(..., axis=1)`` performs 8
    independent per-row binary-search probes in ONE vector op, so the
    within-row inverse costs 7 rounds x ~3 ops instead of a 10-round search
    across all 1024 lanes (each round of which needs an 8-leaf gather
    tree). Rows then land at consecutive spans (a row's fires hold
    consecutive ranks), one broadcast-gather per row."""
    m = fired.astype(jnp.float32)
    # Within-row INCLUSIVE prefix counts (earlier-or-equal lanes), via the
    # <=-triangular matmul; row offsets by a log2 doubling fold.
    incl_w = jax.lax.dot_general(
        m, tril128, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32) + fired.astype(jnp.int32)
    row_tot = jnp.broadcast_to(jnp.sum(m, axis=1, keepdims=True), m.shape)
    sub = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    inc = row_tot
    sh = 1
    while sh < m.shape[0]:
        rolled = pltpu.roll(inc, sh, 0)
        inc = inc + jnp.where(sub >= sh, rolled, 0.0)
        sh <<= 1
    row_excl = (inc - row_tot).astype(jnp.int32)  # rank of a row's 1st fire
    row_cnt = row_tot.astype(jnp.int32)
    total = jnp.sum(m).astype(jnp.int32)

    # Within-row inverse: sel[r, j] = #{m: incl_w[r, m] <= j} = the column
    # of row r's rank-j fire (7-round binary search, all rows at once).
    j = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    lo = jnp.zeros(m.shape, jnp.int32)
    step = LANES // 2
    while step >= 1:
        cand = lo + step
        probe = jnp.take_along_axis(incl_w, cand - 1, axis=1)
        lo = jnp.where(probe <= j, cand, lo)
        step //= 2
    compact = jnp.take_along_axis(values, jnp.minimum(lo, LANES - 1), axis=1)

    # Place row r's compacted run at window offset off + row_excl[r].
    contrib = jnp.zeros((WINDOW_ROWS, LANES), values.dtype)
    valid_any = jnp.zeros((WINDOW_ROWS, LANES), jnp.bool_)
    for r in range(SUBLANES):
        # row_excl/row_cnt are row-constant: a (1,128) slice broadcast over
        # sublanes only (Mosaic has no combined sublane+lane broadcast).
        o_r = off + jnp.broadcast_to(row_excl[r : r + 1, :], (WINDOW_ROWS, LANES))
        c_r = jnp.broadcast_to(row_cnt[r : r + 1, :], (WINDOW_ROWS, LANES))
        idx = win_pos - o_r
        valid = (idx >= 0) & (idx < c_r)
        row_vals = jnp.take_along_axis(
            jnp.broadcast_to(compact[r][None, :], (WINDOW_ROWS, LANES)),
            idx & (LANES - 1),
            axis=1,
        )
        contrib = jnp.where(valid, row_vals, contrib)
        valid_any = valid_any | valid
    return contrib, valid_any, total


def _deposit_kernel(
    meta_ref,      # scalar-prefetch (ngroups, 4) i32: [body_words, 0, 0, 0]
    staging_ref,   # VMEM (B+1, 8, 128) i32 — word completed at each step
    maskb_ref,     # VMEM (ceil(B/32), 8, 128) i32 — fire bits, bit t&31 of row t>>5
    out_ref,       # VMEM (rows, 128) i32 — the group's interleaved stream
    *,
    n_steps: int,
    out_rows: int,
):
    """Backward deposit: walks steps in reverse carrying, per lane, the two
    most recently completed words (v1, v2). At every fire the decoder's
    consumption slot receives the word completed two fires later — walking
    backward that is exactly ``v2`` (container/interleave.py simulates the
    same identity forward with a reverse scan; docs/FORMATS.md §3). The
    final carries are the preload words: v1 = word 0, v2 = word 1.

    Replaces the 0.1 Gelem/s XLA deposit scatter (one element per
    (lane, step)) with an in-kernel compaction into a 9-row sliding window:
    inverse ranks by binary search over the MXU prefix count, values pulled
    through tile-local lane gathers.
    """
    g = pl.program_id(0)
    shape = (SUBLANES, LANES)

    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tril128 = (li < lj).astype(jnp.float32)  # strictly lower: earlier lanes

    win_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (WINDOW_ROWS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (WINDOW_ROWS, LANES), 1)
    )

    # Zero the output: deposits only touch live body slots; padding past the
    # group's word count (and any cap slack) must read as zeros.
    def zero_body(i, _):
        out_ref[pl.ds(i * SUBLANES, SUBLANES), :] = jnp.zeros(shape, jnp.int32)
        return 0

    jax.lax.fori_loop(0, out_rows // SUBLANES, zero_body, 0)

    def body(tau, carry):
        v1, v2, head = carry
        t = n_steps - 1 - tau
        maskw = maskb_ref[t >> 5]
        fired = ((maskw >> (t & 31)) & 1) > 0
        word = pltpu.bitcast(staging_ref[t], jnp.uint32)

        # Deposit v2 of every fired lane at body slot head - total + rank.
        # The window math needs head_new before the compaction runs, so the
        # total comes out of _deposit_step after the fact; compute it first
        # from a cheap full-sum to keep one code path.
        total = jnp.sum(fired.astype(jnp.float32)).astype(jnp.int32)
        head_new = head - total
        abs0 = PRELOAD_WORDS * GROUP_LANES + head_new
        base_row = jnp.clip(abs0 >> 7, 0, out_rows - WINDOW_ROWS)
        off = abs0 - base_row * LANES
        contrib, valid, _ = _deposit_step(
            pltpu.bitcast(v2, jnp.int32), fired, tril128, win_pos, off
        )
        window = out_ref[pl.ds(base_row, WINDOW_ROWS), :]
        out_ref[pl.ds(base_row, WINDOW_ROWS), :] = jnp.where(
            valid, contrib, window
        )

        v2n = jnp.where(fired, v1, v2)
        v1n = jnp.where(fired, word, v1)
        return v1n, v2n, head_new

    v1, v2, _ = jax.lax.fori_loop(
        0, n_steps, body,
        (
            pltpu.bitcast(staging_ref[n_steps], jnp.uint32),  # partial word
            jnp.zeros(shape, jnp.uint32),
            meta_ref[g, 0],
        ),
    )
    # Final carries are the preload: lane-major words 0..1023 = v1 (word 0),
    # 1024..2047 = v2 (word 1).
    out_ref[0:SUBLANES, :] = pltpu.bitcast(v1, jnp.int32)
    out_ref[SUBLANES : 2 * SUBLANES, :] = pltpu.bitcast(v2, jnp.int32)


@functools.partial(jax.jit, static_argnames=("words_cap", "interpret"))
def deposit_streams_pallas(
    staging: jax.Array,    # (ngroups*(B+1), 8, 128) i32 grid-layout staging
    mask_bits: jax.Array,  # (ngroups*ceil(B/32), 8, 128) i32 packed fire bits
    body_words: jax.Array, # (ngroups,) i32 body word count per group
    words_cap: int,
    interpret: bool = False,
):
    """Assemble interleaved streams from pack-kernel staging, entirely in a
    Pallas kernel (no XLA scatter). Returns (ngroups, 2048 + cap) uint32
    streams; cap is rounded up so the stream is a whole number of (8,128)
    tiles. ``words_cap`` must bound every group's body words."""
    # Round the cap so out_rows is a multiple of SUBLANES (the in-kernel
    # zero-fill writes whole (8,128) tiles).
    cap = (words_cap + SUBLANES * LANES - 1) // (SUBLANES * LANES) * (
        SUBLANES * LANES
    )
    ngroups = body_words.shape[0]
    B = staging.shape[0] // ngroups - 1
    mb = mask_bits.shape[0] // ngroups
    out_rows = (PRELOAD_WORDS * GROUP_LANES + cap) // LANES

    meta = jnp.zeros((ngroups, 4), jnp.int32).at[:, 0].set(
        body_words.astype(jnp.int32)
    )
    kernel = functools.partial(
        _deposit_kernel, n_steps=B, out_rows=out_rows
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((B + 1, SUBLANES, LANES), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((mb, SUBLANES, LANES), lambda g, *_: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((out_rows, LANES), lambda g, *_: (g, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups * out_rows, LANES), jnp.int32),
        interpret=interpret,
    )(meta, staging, mask_bits)
    return (
        jax.lax.bitcast_convert_type(out, jnp.uint32)
        .reshape(ngroups, out_rows * LANES)
    )


@functools.partial(jax.jit, static_argnames=("words_per_block", "interpret"))
def pack_blocks_pallas(
    codes: jax.Array,   # (nblocks, B) uint32 right-justified codewords
    lens: jax.Array,    # (nblocks, B) int32 lengths (0 = padding)
    words_per_block: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in device twin of ops/encode.pack_blocks via the Pallas packer.

    nblocks must be a multiple of GROUP_LANES (container layout already
    pads lanes); returns the (nblocks, words_per_block) uint32 slab.
    """
    nblocks, B = codes.shape
    W = words_per_block
    if (nblocks // GROUP_LANES) * GROUP_LANES != nblocks:
        raise ValueError("nblocks must be a multiple of GROUP_LANES")

    # Compact staging -> slab rows. Word j of lane l completed at the step
    # where cumulative bits first reached 32*(j+1); the final partial word
    # sits in staging row B. One scatter element per completed word.
    st = _staging(codes, lens, interpret)  # (lane, step)

    cum = jnp.cumsum(lens.astype(jnp.int32), axis=1)
    r = cum >> 5                       # words completed after each step
    r_prev = jnp.concatenate(
        [jnp.zeros((nblocks, 1), jnp.int32), r[:, :-1]], axis=1
    )
    emit = r > r_prev                  # word r-1 completed at this step
    lane = jnp.arange(nblocks, dtype=jnp.int32)[:, None]
    # Non-emitting steps contribute value 0 at a VALID in-order position
    # (clamped word index) rather than an end-of-buffer sentinel: with
    # indices_are_sorted the index stream must be monotone — a large
    # sentinel between real indices silently corrupts the scatter on TPU
    # (interpret mode doesn't exploit sortedness and hides it).
    dst = lane * W + jnp.clip(r - 1, 0, W - 1)
    slab = jnp.zeros(nblocks * W, jnp.uint32)
    slab = slab.at[dst.reshape(-1)].add(
        jnp.where(emit, st[:, :B], 0).reshape(-1),
        mode="drop", indices_are_sorted=True,
    )
    # Final partials: lanes whose bit total is not word-aligned.
    total_bits = cum[:, -1]
    has_tail = (total_bits & 31) > 0
    tail_dst = lane[:, 0] * W + jnp.clip(total_bits >> 5, 0, W - 1)
    slab = slab.at[tail_dst].add(
        jnp.where(has_tail, st[:, B], 0), mode="drop", indices_are_sorted=True
    )
    return slab.reshape(nblocks, W)
