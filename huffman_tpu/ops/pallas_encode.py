"""Pallas TPU kernel: lane-parallel Huffman bit-packing (encode).

The XLA formulation of the pack stage (ops/encode.pack_blocks) deposits
each codeword's two word-parts with a scatter-add; XLA scatter runs at
~0.1 Gelem/s on this hardware, making it the device-encode wall
(scripts/perf_encode.py). This kernel packs the way the decoder decodes:
one block per vector lane, a 32-bit staging word per lane, one symbol per
step — the reference's encoder walks '0'/'1' strings per bit
(Compressor.cu:182-313); here every step is a handful of vector shifts.

Because max code length <= 32, at most ONE word completes per lane per
step, so completed words land in a dense (step, lane) staging grid with no
lane scatter. A single sorted scatter (one element per COMPLETED WORD, not
per codeword part — ~2.5x fewer, and only one scatter call) compacts the
staging grid into the per-lane slab rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import GROUP_LANES, LANES, PRELOAD_WORDS, SUBLANES


def _pack_kernel(codes_ref, lens_ref, out_ref, *, n_steps: int):
    """codes/lens: (n_steps, 8, 128) for this group's symbols (step-major);
    out: (n_steps + 1, 8, 128) staging — row t holds the word completed at
    step t (0 if none), row n_steps the final partial word (left-aligned).
    """
    shape = (SUBLANES, LANES)

    def body(t, carry):
        buf, f = carry  # partial word (top f bits valid), fill count
        c = codes_ref[t]
        L = lens_ref[t]
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
        out_ref[t] = pltpu.bitcast(jnp.where(emit, word, jnp.uint32(0)), jnp.int32)
        spill = jnp.where(
            total > 32,
            c << ((jnp.uint32(64) - tot_u) & jnp.uint32(31)),
            jnp.uint32(0),
        )
        buf = jnp.where(emit, spill, word)
        f = total & 31
        return buf, f

    buf, f = jax.lax.fori_loop(
        0, n_steps, body,
        (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.int32)),
    )
    out_ref[n_steps] = pltpu.bitcast(buf, jnp.int32)


def _staging(codes: jax.Array, lens: jax.Array, interpret: bool) -> jax.Array:
    """Run the pack kernel; returns staging (nblocks, B+1) uint32 in
    (lane, step) order — row t holds the word completed at step t."""
    nblocks, B = codes.shape
    ngroups = nblocks // GROUP_LANES

    def to_grid(a):
        return (
            a.reshape(ngroups, SUBLANES, LANES, B)
            .transpose(0, 3, 1, 2)
            .reshape(ngroups * B, SUBLANES, LANES)
        )

    kernel = functools.partial(_pack_kernel, n_steps=B)
    staging = pl.pallas_call(
        kernel,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((B, SUBLANES, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((B, SUBLANES, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B + 1, SUBLANES, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (ngroups * (B + 1), SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(to_grid(codes.astype(jnp.uint32)), to_grid(lens.astype(jnp.int32)))
    return (
        jax.lax.bitcast_convert_type(staging, jnp.uint32)
        .reshape(ngroups, B + 1, GROUP_LANES)
        .transpose(0, 2, 1)
        .reshape(nblocks, B + 1)
    )


@functools.partial(jax.jit, static_argnames=("words_cap", "interpret"))
def pack_streams_pallas(
    codes: jax.Array,     # (n_lanes, B) uint32 codewords (0 on garbage steps)
    eff_lens: jax.Array,  # (n_lanes, B) int32 PROTOCOL lengths (garbage steps
                          # carry min_len with code 0 — docs/FORMATS.md §3)
    n_real: jax.Array,    # scalar int32 real lane count
    words_cap: int,
    interpret: bool = False,
):
    """Pack + interleave in one pass: Pallas packer -> interleaved streams,
    with NO intermediate slab (device twin of
    container/interleave.build_interleaved_streams fed by the same eff
    lengths).

    Key identity (docs/FORMATS.md §3): with one bit-cumsum driving both
    sides, the decoder consumes word j at the same step the encoder
    completes word j-2 (both fire when cum crosses 32*(j-1)), so the value
    landing at each consumption slot is the word completed TWO FIRES LATER
    in the same lane — a reverse lookahead scan, keeping the one deposit
    scatter monotone. Returns (streams (ngroups, 2048 + words_cap) uint32,
    counts).

    ``words_cap`` must bound EVERY group's body words (counts[g] - 2048),
    not the average — a group's deposits silently spill into the next
    group's region past its cap (mode="drop" only guards the buffer end).
    B * GROUP_LANES is always safe; callers with host-visible bit totals
    can size it exactly and verify via the returned counts."""
    n_lanes, B = codes.shape
    ngroups = n_lanes // GROUP_LANES

    st = _staging(codes, eff_lens, interpret)  # (n_lanes, B+1)

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
