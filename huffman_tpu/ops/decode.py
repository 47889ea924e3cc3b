"""Lane-parallel canonical Huffman decode on TPU.

The reference has no parallel decoder at all — decompression is a
sequential CPU tree walk over every payload bit (Decompressor.cu:259-291).
This module supplies the capability the reference lacks (the north-star
headline): thousands of independent blocks decode simultaneously, one block
per vector lane.

Algorithm (per step, vectorized across all blocks):

1. fetch the two words straddling each block's bit cursor and form a
   32-bit left-justified ``peek``;
2. canonical length resolve: ``len = min(1 + count(peek >= lj_limit[l]),
   max_len)`` — a 32-wide broadcast compare, no tree, no per-bit loop
   (boundary tables from codebook.py);
3. ``rank = base[len] + (peek >> (32 - len))`` (u32 wrap-exact), then one
   gather from the canonical symbol permutation;
4. advance the cursor by ``len``.

A `lax.fori_loop` runs B steps, each decoding one symbol in *every* block:
total work O(B) steps regardless of block count. Blocks are padded to B
symbols; lanes whose stream ended decode garbage that the container layer
trims (their cursors clip at the slab edge, never OOB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_blocks(
    slab: jax.Array,        # (nblocks, W) uint32, each row an MSB-first stream
    lj_limit: jax.Array,    # (MAX_CODE_LEN,) uint32
    base: jax.Array,        # (MAX_CODE_LEN + 1,) uint32 (wrapped)
    sym_order: jax.Array,   # (n_pad,) int32 canonical symbol permutation
    n_steps: int,           # symbols per block (static)
    max_len,                # traced scalar clamp (codebook max length) —
                            # traced so one compile serves every codebook
) -> jax.Array:
    """Decode every block's first ``n_steps`` symbols. Returns (nblocks,
    n_steps) int32 symbols."""
    nblocks, W = slab.shape

    def body(t, carry):
        pos, out = carry
        w = pos >> 5
        sh = (pos & 31).astype(jnp.uint32)
        hi = jnp.take_along_axis(slab, w[:, None], axis=1, mode="clip")[:, 0]
        lo = jnp.take_along_axis(slab, w[:, None] + 1, axis=1, mode="clip")[:, 0]
        # (hi:lo) << sh, keeping the top 32 bits. sh == 0 would need
        # lo >> 32 (undefined): mask it instead.
        peek = (hi << sh) | jnp.where(sh > 0, lo >> ((32 - sh) & 31), jnp.uint32(0))
        length = 1 + jnp.sum(
            (peek[:, None] >= lj_limit[None, :]).astype(jnp.int32), axis=1
        )
        length = jnp.minimum(length, jnp.asarray(max_len, jnp.int32))
        rank = base[length] + (peek >> (32 - length).astype(jnp.uint32))
        sym = jnp.take(sym_order, rank.astype(jnp.int32), mode="clip")
        out = jax.lax.dynamic_update_slice(out, sym[:, None], (0, t))
        return pos + length, out

    # Derive the initial carry from the input so its sharding/varying axes
    # match the loop body's outputs under shard_map.
    zero_like_rows = (slab[:, 0] & 0).astype(jnp.int32)
    pos0 = zero_like_rows
    out0 = jnp.zeros((nblocks, n_steps), dtype=jnp.int32) + zero_like_rows[:, None]
    _, out = jax.lax.fori_loop(0, n_steps, body, (pos0, out0))
    return out
