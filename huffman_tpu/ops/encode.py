"""Parallel Huffman encode on TPU: gather -> scan -> vector bit-pack.

The reference encodes with three GPU kernels: a per-pair code-length gather
(Compressor.cu:50-61), a Thrust inclusive scan for absolute bit offsets
(Compressor.cu:546-557), and an output-centric kernel that binary-searches
the offset array per output byte and walks '0'/'1' *strings* bit by bit
(Compressor.cu:182-313). The TPU formulation keeps the same three phases but
is input-centric and fully vectorized:

1. gather ``(code, len)`` per symbol from dense 65,536-entry tables;
2. per-block exclusive ``cumsum`` of lengths -> bit offsets (the block
   carry is resolved outside, so offsets stay int32);
3. each codeword is shifted into at most two 32-bit output words
   (``MAX_CODE_LEN <= 32``) and deposited with a single sorted scatter-add —
   disjoint bit ranges make ADD equivalent to OR, so no atomics and no
   per-bit loops, just vector shifts.

Everything is static-shaped and jit-friendly; blocks pack into fixed
``words_per_block`` slabs chosen by the caller from the real bit totals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_codes(symbols: jax.Array, enc_codes: jax.Array, enc_lens: jax.Array,
                 valid: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Per-symbol (code, len) gather; ``valid`` masks padding lanes to len 0."""
    symbols = symbols.astype(jnp.int32)
    codes = jnp.take(enc_codes, symbols, mode="clip")
    lens = jnp.take(enc_lens, symbols, mode="clip")
    if valid is not None:
        codes = jnp.where(valid, codes, 0)
        lens = jnp.where(valid, lens, 0)
    return codes, lens


def gather_codes_packed(symbols: jax.Array, enc_packed: jax.Array,
                        valid: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Single-gather variant: table words hold ``len << 26 | code`` (valid
    while max code length <= 26 — always true under the native container's
    depth-18 default). XLA gather is ~0.25 Gelem/s here, so one gather
    instead of two halves the dominant encode-side cost."""
    symbols = symbols.astype(jnp.int32)
    packed = jnp.take(enc_packed, symbols, mode="clip")
    codes = packed & jnp.uint32((1 << 26) - 1)
    lens = (packed >> 26).astype(jnp.int32)
    if valid is not None:
        codes = jnp.where(valid, codes, 0)
        lens = jnp.where(valid, lens, 0)
    return codes, lens


def block_offsets(lens: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(nblocks, B) lengths -> (exclusive in-block bit offsets, block totals)."""
    inclusive = jnp.cumsum(lens, axis=-1, dtype=jnp.int32)
    return inclusive - lens, inclusive[..., -1]


def _split_codeword(codes: jax.Array, lens: jax.Array, offsets: jax.Array):
    """Place each codeword into the two u32 words it can touch.

    Stream convention: bit p of the stream is bit (31 - p%32) of word p//32
    (big-endian words). Returns (word_index, part1, part2) where part1 ORs
    into word_index and part2 into word_index + 1.
    """
    codes = codes.astype(jnp.uint32)
    w = offsets >> 5
    sh = offsets & 31
    r = sh + lens  # end bit position within the 64-bit window at w
    # Shift amounts clamped to [0, 31]: where() evaluates both branches and
    # u32 shifts by >= 32 are undefined in XLA.
    s_left = jnp.clip(32 - r, 0, 31).astype(jnp.uint32)
    s_right = jnp.clip(r - 32, 0, 31).astype(jnp.uint32)
    s_spill = jnp.clip(64 - r, 0, 31).astype(jnp.uint32)
    fits = r <= 32
    part1 = jnp.where(fits, codes << s_left, codes >> s_right)
    part2 = jnp.where(fits, jnp.uint32(0), codes << s_spill)
    zero = lens == 0
    part1 = jnp.where(zero, jnp.uint32(0), part1)
    part2 = jnp.where(zero, jnp.uint32(0), part2)
    return w, part1, part2


@functools.partial(jax.jit, static_argnames=("words_per_block",))
def pack_blocks(codes: jax.Array, lens: jax.Array, offsets: jax.Array,
                words_per_block: int) -> jax.Array:
    """Pack (nblocks, B) codewords into an (nblocks, words_per_block) slab.

    Offsets are in-block bit offsets; each block's stream starts at bit 0 of
    its own slab row. Requires block_bits <= words_per_block * 32 (caller
    sizes the slab from the scan totals).
    """
    nblocks, B = codes.shape
    W = words_per_block
    w, part1, part2 = _split_codeword(codes, lens, offsets)
    blk = jnp.arange(nblocks, dtype=jnp.int32)[:, None]
    flat1 = (blk * W + w).reshape(-1)
    flat2 = flat1 + 1
    slab = jnp.zeros(nblocks * W, dtype=jnp.uint32)
    # Indices ascend block-major; 'drop' guards the final word's (zero)
    # spill landing one past a full block.
    slab = slab.at[flat1].add(part1.reshape(-1), mode="drop", indices_are_sorted=True)
    slab = slab.at[flat2].add(part2.reshape(-1), mode="drop", indices_are_sorted=True)
    return slab.reshape(nblocks, W)


@functools.partial(jax.jit, static_argnames=("total_words",))
def pack_stream(codes: jax.Array, lens: jax.Array, offsets_word: jax.Array,
                offsets_bit: jax.Array, total_words: int) -> jax.Array:
    """Pack one continuous bitstream (the reference container's payload).

    Global bit offsets can exceed 2^31 for multi-GB files, so they arrive
    split as (word_index, bit_in_word) int32 pairs. Adjacent codewords of
    neighboring blocks may share a boundary word — the sorted scatter-add
    merges them exactly as the disjoint-bits argument allows.
    """
    w, part1, part2 = _split_codeword(
        codes.reshape(-1), lens.reshape(-1),
        offsets_bit.reshape(-1),
    )
    w = offsets_word.reshape(-1) + w
    words = jnp.zeros(total_words, dtype=jnp.uint32)
    words = words.at[w].add(part1, mode="drop", indices_are_sorted=True)
    words = words.at[w + 1].add(part2, mode="drop", indices_are_sorted=True)
    return words
