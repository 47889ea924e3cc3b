"""MSB-first bit-level I/O, vectorized with NumPy.

The reference container is one continuous MSB-first bitstream after a short
raw prefix (reference: Compressor.cu:634-700 ``writeFromUChar`` /
``writeIfFullBuffer`` semantics; Decompressor.cu:126-182 readers). This
module provides:

* :class:`BitWriter` / :class:`BitReader` — scalar, for small headers.
* :func:`pack_codes` — vectorized variable-length bit packing: given a
  vector of right-justified codewords and their lengths, produce the packed
  big-endian byte stream. This is the host (NumPy) twin of the Pallas/XLA
  bit-pack kernel in :mod:`huffman_tpu.ops.encode` and is used for testing
  and for host-side container assembly.
* :func:`bytes_to_u32_msb` / :func:`u32_msb_to_bytes` — byte <-> big-endian
  u32 word views used throughout (bit *p* of the stream lives in word
  ``p >> 5`` at bit position ``31 - (p & 31)``).
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    """Scalar MSB-first bit writer (header-sized payloads only)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0  # bit accumulator, MSB-first
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        if value < 0 or value >> nbits:
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_bytes_aligned(self, data: bytes) -> None:
        """Append raw bytes; requires the cursor to be byte-aligned."""
        if self._nbits != 0:
            raise ValueError("bit cursor not byte-aligned")
        self._buf.extend(data)

    @property
    def bit_position(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def getvalue(self, *, flush_left_aligned: bool = True) -> bytes:
        """Final byte stream. A trailing partial byte is left-aligned
        (zero-padded on the right), matching the reference's final flush
        (Compressor.cu:597-601)."""
        out = bytearray(self._buf)
        if self._nbits:
            if not flush_left_aligned:
                raise ValueError("unaligned stream")
            out.append((self._acc << (8 - self._nbits)) & 0xFF)
        return bytes(out)


class BitReader:
    """Scalar MSB-first bit reader (header-sized payloads only)."""

    def __init__(self, data: bytes, bit_offset: int = 0) -> None:
        self._data = data
        self._pos = bit_offset

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._data) * 8:
            raise EOFError("bitstream exhausted")
        value = 0
        pos = self._pos
        remaining = nbits
        while remaining > 0:
            byte = self._data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            chunk = (byte >> (avail - take)) & ((1 << take) - 1)
            value = (value << take) | chunk
            pos += take
            remaining -= take
        self._pos = pos
        return value

    @property
    def bit_position(self) -> int:
        return self._pos

    def seek_bit(self, bit_offset: int) -> None:
        self._pos = bit_offset


def exclusive_cumsum(lengths: np.ndarray, start: int = 0) -> np.ndarray:
    """Exclusive prefix sum of codeword lengths -> absolute bit offsets."""
    offsets = np.empty(lengths.shape[0], dtype=np.int64)
    if lengths.shape[0]:
        np.cumsum(lengths, dtype=np.int64, out=offsets)
        offsets[1:] = offsets[:-1]
        offsets[0] = 0
        offsets += start
    return offsets


def pack_codes(
    codes: np.ndarray,
    lengths: np.ndarray,
    start_bit: int = 0,
    total_bits: int | None = None,
) -> tuple[np.ndarray, int]:
    """Vectorized MSB-first variable-length bit pack.

    Parameters
    ----------
    codes : uint32 array of right-justified codewords.
    lengths : integer array of codeword bit lengths (0..32). Zero-length
        entries contribute nothing.
    start_bit : bit offset at which the first codeword begins (bits before
        it are left as zeros for the caller to OR in).
    total_bits : stream length in bits; defaults to start + sum(lengths).

    Returns
    -------
    (words, nbits): big-endian uint32 word array covering ``nbits`` bits
    (trailing bits zero), and the total bit count.

    Because distinct codewords occupy disjoint bit ranges, OR and ADD are
    interchangeable; we use bincount-style summation which NumPy vectorizes.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    offsets = exclusive_cumsum(lengths, start_bit)
    nbits = int(offsets[-1] + lengths[-1]) if lengths.shape[0] else start_bit
    if total_bits is not None:
        if total_bits < nbits:
            raise ValueError("total_bits smaller than packed size")
        nbits = total_bits
    nwords = (nbits + 31) >> 5

    w = (offsets >> 5).astype(np.int64)
    sh = (offsets & 31).astype(np.uint64)
    # Bits of code c (length l) at offset o: the stream positions
    # [o, o+l) map into word w starting at bit (31 - sh) downward.
    # part1: bits that land in word w; part2: spill into word w+1.
    l_ = lengths.astype(np.uint64)
    right = sh + l_  # bit position one past the end, within a 64-bit window
    # Shift code left so its MSB sits at bit (63 - sh) of a u64 window,
    # then split the window into two u32 halves. Zero-length entries must
    # contribute nothing even with a nonzero code value (and their shift
    # count of 64 - sh would be undefined), so mask them explicitly.
    zero = lengths == 0
    window = codes << (np.uint64(64) - np.where(zero, np.uint64(32), right))
    part1 = np.where(zero, 0, (window >> np.uint64(32)).astype(np.uint64))
    part2 = np.where(zero, 0, (window & np.uint64(0xFFFFFFFF)).astype(np.uint64))

    words64 = np.zeros(nwords + 1, dtype=np.uint64)
    np.add.at(words64, w, part1)
    np.add.at(words64, w + 1, part2)
    words = words64[:nwords].astype(np.uint32)
    return words, nbits


def pack_codes_blocked(
    codes: np.ndarray, lengths: np.ndarray, words_per_block: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-block bit pack: NumPy twin of ops/encode.pack_blocks.

    codes/lengths are (nblocks, B); every block's stream starts at bit 0 of
    its own row of the returned (nblocks, words_per_block) uint32 slab.
    Also returns per-block bit totals.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    nblocks, B = codes.shape
    W = words_per_block
    inclusive = np.cumsum(lengths, axis=1)
    offsets = inclusive - lengths
    block_bits = inclusive[:, -1] if B else np.zeros(nblocks, dtype=np.int64)

    w = (offsets >> 5) + np.arange(nblocks, dtype=np.int64)[:, None] * W
    sh = (offsets & 31).astype(np.uint64)
    right = sh + lengths.astype(np.uint64)
    window = codes << (np.uint64(64) - right)
    # length-0 entries (padding) must contribute nothing
    zero = lengths == 0
    part1 = np.where(zero, 0, window >> np.uint64(32))
    part2 = np.where(zero, 0, window & np.uint64(0xFFFFFFFF))

    flat = np.zeros(nblocks * W + 1, dtype=np.uint64)
    np.add.at(flat, w.reshape(-1), part1.reshape(-1))
    np.add.at(flat, w.reshape(-1) + 1, part2.reshape(-1))
    return flat[: nblocks * W].astype(np.uint32).reshape(nblocks, W), block_bits


def u32_msb_to_bytes(words: np.ndarray, nbits: int) -> bytes:
    """Big-endian u32 words -> byte stream truncated to ceil(nbits/8) bytes."""
    nbytes = (nbits + 7) >> 3
    raw = words.astype(">u4").tobytes()
    return raw[:nbytes]


def bytes_to_u32_msb(data: bytes, bit_offset: int = 0) -> np.ndarray:
    """Byte stream -> big-endian u32 word array (zero padded).

    ``bit_offset`` merely documents where meaningful bits start; the word
    array always begins at byte 0 of ``data``.
    """
    del bit_offset
    pad = (-len(data)) % 4
    if pad:
        data = data + b"\x00" * pad
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)
