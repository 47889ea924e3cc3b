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

from .pallas_decode import GROUP_LANES, LANES, SUBLANES


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
    ngroups = nblocks // GROUP_LANES
    if ngroups * GROUP_LANES != nblocks:
        raise ValueError("nblocks must be a multiple of GROUP_LANES")

    # (nblocks, B) -> (ngroups * B, 8, 128) step-major per group.
    def to_grid(a):
        return (
            a.reshape(ngroups, SUBLANES, LANES, B)
            .transpose(0, 3, 1, 2)
            .reshape(ngroups * B, SUBLANES, LANES)
        )

    cg = to_grid(codes.astype(jnp.uint32))
    lg = to_grid(lens.astype(jnp.int32))

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
    )(cg, lg)

    # Compact staging -> slab rows. Word j of lane l completed at the step
    # where cumulative bits first reached 32*(j+1); the final partial word
    # sits in staging row B. One scatter element per completed word.
    st = (
        jax.lax.bitcast_convert_type(staging, jnp.uint32)
        .reshape(ngroups, B + 1, GROUP_LANES)
        .transpose(0, 2, 1)
        .reshape(nblocks, B + 1)
    )  # (lane, step) — one HBM transpose pass

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
