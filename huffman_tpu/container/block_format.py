"""Native block container ("HTPU"): the TPU-first archive format.

The reference's container is one continuous bitstream, which forces its
decoder to walk the payload serially (Decompressor.cu:259-291). The native
format instead encodes fixed-size *symbol blocks* independently (SURVEY.md
§7 architecture decision): each block's bitstream starts word-aligned, the
header carries per-block bit lengths, and the canonical codebook is stored
as lengths only (counts-per-length + symbols in canonical order). Every
block decodes in parallel — one vector lane per block on TPU.

Layout (little-endian, byte-aligned):

    offset  size  field
    0       4     magic "HTPU" (u32 = 0x48545055)
    4       1     version (1)
    5       1     flags (bit0: odd input length)
    6       1     raw last byte (if odd, else 0)
    7       1     max code length
    8       8     original size in bytes (u64)
    16      4     symbols per block (u32)
    20      4     number of blocks (u32)
    24      4     unique symbol count (u32)
    28      4     CRC32 of the original data (u32)  -- integrity, a
                  capability the reference format lacks entirely
    32      128   count of codes per length 1..32 (u32[32])
    160     2n    symbols in canonical order (u16[n])
    ...     4b    per-block payload bit lengths (u32[num_blocks])
    ...           payload: each block's stream, zero-padded to a 4-byte
                  boundary, concatenated in order (big-endian u32 words,
                  MSB-first bits)
"""

from __future__ import annotations

import zlib

import numpy as np

from ..bitio import pack_codes
from ..codebook import Codebook
from ..constants import (
    DEFAULT_BLOCK_SYMBOLS,
    MAX_CODE_LEN,
    MAX_SYMBOLS,
    NATIVE_MAGIC,
    NATIVE_VERSION,
)
from .reference_format import bytes_to_symbols, histogram_host, symbols_to_bytes

_HEADER_BYTES = 32
_COUNTS_BYTES = 4 * MAX_CODE_LEN


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bucket_words(w: int) -> int:
    """Round slab width up to a coarse bucket to bound jit recompiles."""
    w = max(w, 8)
    bucket = 8
    while bucket < w:
        bucket <<= 1
    return bucket


def _codebook_to_header(cb: Codebook) -> bytes:
    lens_in_order = cb.lengths[cb.sym_order]
    counts = np.bincount(lens_in_order, minlength=MAX_CODE_LEN + 1)[1:].astype("<u4")
    return counts.tobytes() + cb.sym_order.astype("<u2").tobytes()


def _codebook_from_header(blob: bytes, n_unique: int) -> tuple[Codebook, int]:
    counts = np.frombuffer(blob[_HEADER_BYTES : _HEADER_BYTES + _COUNTS_BYTES], dtype="<u4")
    off = _HEADER_BYTES + _COUNTS_BYTES
    syms = np.frombuffer(blob[off : off + 2 * n_unique], dtype="<u2")
    off += 2 * n_unique
    if int(counts.sum()) != n_unique:
        raise ValueError("corrupt codebook: counts do not sum to n_unique")
    lengths = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
    lengths[syms] = np.repeat(
        np.arange(1, MAX_CODE_LEN + 1, dtype=np.uint8), counts.astype(np.int64)
    )
    return Codebook.from_lengths(lengths), off


def compress(
    data: bytes,
    backend: str | None = None,
    block_symbols: int = DEFAULT_BLOCK_SYMBOLS,
    codebook: Codebook | None = None,
) -> bytes:
    symbols, is_odd, last_byte = bytes_to_symbols(data)
    n_pairs = symbols.size
    B = block_symbols
    nblocks = max((n_pairs + B - 1) // B, 0)

    freqs = histogram_host(symbols) if codebook is None else None
    if codebook is None:
        codebook = Codebook.from_frequencies(freqs)

    if backend in (None, "jax") and n_pairs:
        slab_np, block_bits = _encode_blocks_jax(symbols, codebook, nblocks, B)
    else:
        slab_np, block_bits = _encode_blocks_numpy(symbols, codebook, nblocks, B)

    header = bytearray(_HEADER_BYTES)
    header[0:4] = int(NATIVE_MAGIC).to_bytes(4, "little")
    header[4] = NATIVE_VERSION
    header[5] = 1 if is_odd else 0
    header[6] = last_byte
    header[7] = codebook.max_len
    header[8:16] = len(data).to_bytes(8, "little")
    header[16:20] = B.to_bytes(4, "little")
    header[20:24] = nblocks.to_bytes(4, "little")
    header[24:28] = codebook.n_unique.to_bytes(4, "little")
    header[28:32] = (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")

    out = bytearray(bytes(header))
    out += _codebook_to_header(codebook)
    out += block_bits.astype("<u4").tobytes()

    if nblocks:
        # Trim each slab row to its word count and concatenate (vectorized
        # gather of the kept words).
        word_counts = (block_bits + 31) // 32
        W = slab_np.shape[1]
        keep = np.repeat(np.arange(nblocks, dtype=np.int64), word_counts) * W
        within = np.concatenate([np.arange(c, dtype=np.int64) for c in word_counts])
        out += slab_np.reshape(-1)[keep + within].astype(">u4").tobytes()
    return bytes(out)


def _encode_blocks_numpy(symbols, codebook, nblocks, B):
    block_bits = np.zeros(nblocks, dtype=np.int64)
    rows = []
    for b in range(nblocks):
        blk = symbols[b * B : (b + 1) * B]
        codes, lens = codebook.encode_symbols_host(blk)
        words, nbits = pack_codes(codes, lens)
        rows.append(words)
        block_bits[b] = nbits
    W = max((r.size for r in rows), default=1)
    slab = np.zeros((nblocks, W), dtype=np.uint32)
    for b, r in enumerate(rows):
        slab[b, : r.size] = r
    return slab, block_bits


def _encode_blocks_jax(symbols, codebook, nblocks, B):
    import jax.numpy as jnp

    from ..ops import encode as enc
    from ..ops.tables import device_tables

    t = device_tables(codebook)
    padded = np.zeros(nblocks * B, dtype=np.int32)
    padded[: symbols.size] = symbols
    sym_dev = jnp.asarray(padded).reshape(nblocks, B)
    valid = (
        jnp.arange(nblocks * B, dtype=jnp.int32).reshape(nblocks, B)
        < symbols.size
    )
    codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens, valid)
    offsets, block_bits = enc.block_offsets(lens)
    block_bits_np = np.asarray(block_bits).astype(np.int64)
    W = _bucket_words(int((block_bits_np.max(initial=1) + 31) // 32))
    slab = enc.pack_blocks(codes, lens, offsets, W)
    return np.asarray(slab), block_bits_np


class ParsedContainer:
    """Parsed native container header + payload views (host side)."""

    def __init__(self, blob: bytes):
        if len(blob) < _HEADER_BYTES or int.from_bytes(blob[0:4], "little") != NATIVE_MAGIC:
            raise ValueError("not an HTPU container")
        if blob[4] != NATIVE_VERSION:
            raise ValueError(f"unsupported container version {blob[4]}")
        self.is_odd = bool(blob[5] & 1)
        self.last_byte = blob[6]
        self.max_len = blob[7]
        self.original_size = int.from_bytes(blob[8:16], "little")
        self.block_symbols = int.from_bytes(blob[16:20], "little")
        self.num_blocks = int.from_bytes(blob[20:24], "little")
        self.n_unique = int.from_bytes(blob[24:28], "little")
        self.crc32 = int.from_bytes(blob[28:32], "little")
        self.codebook, off = _codebook_from_header(blob, self.n_unique)
        self.block_bits = np.frombuffer(
            blob[off : off + 4 * self.num_blocks], dtype="<u4"
        ).astype(np.int64)
        off += 4 * self.num_blocks
        self.payload = blob[off:]

    def slab(self, words_per_block: int | None = None) -> np.ndarray:
        """Re-slab the tightly packed payload into (nblocks, W) rows."""
        word_counts = (self.block_bits + 31) // 32
        W = words_per_block or _bucket_words(int(word_counts.max(initial=1)))
        words = np.frombuffer(
            self.payload[: int(word_counts.sum()) * 4], dtype=">u4"
        ).astype(np.uint32)
        slab = np.zeros((self.num_blocks, W), dtype=np.uint32)
        dst = np.repeat(np.arange(self.num_blocks, dtype=np.int64), word_counts) * W
        within = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in word_counts]
        ) if self.num_blocks else np.zeros(0, dtype=np.int64)
        slab.reshape(-1)[dst + within] = words
        return slab


def decompress(blob: bytes, backend: str | None = None, verify_crc: bool = True) -> bytes:
    c = ParsedContainer(blob)
    n_pairs = (c.original_size - (1 if c.is_odd else 0)) // 2
    if n_pairs == 0:
        data = symbols_to_bytes(np.zeros(0, np.uint16), c.is_odd, c.last_byte)
    else:
        slab = c.slab()
        if backend in (None, "jax"):
            symbols = _decode_blocks_jax(slab, c)
        else:
            symbols = _decode_blocks_numpy(slab, c)
        data = symbols_to_bytes(
            symbols[:n_pairs].astype(np.uint16), c.is_odd, c.last_byte
        )
    if verify_crc and (zlib.crc32(data) & 0xFFFFFFFF) != c.crc32:
        raise ValueError("CRC mismatch: corrupt container or decode bug")
    return data


def _decode_blocks_jax(slab: np.ndarray, c: ParsedContainer) -> np.ndarray:
    import jax.numpy as jnp

    from ..ops import decode as dec
    from ..ops.tables import device_tables

    t = device_tables(c.codebook)
    out = dec.decode_blocks(
        jnp.asarray(slab), t.lj_limit, t.base, t.sym_order, c.block_symbols, t.max_len
    )
    return np.asarray(out).reshape(-1)


def _decode_blocks_numpy(slab: np.ndarray, c: ParsedContainer) -> np.ndarray:
    out = np.zeros((c.num_blocks, c.block_symbols), dtype=np.uint16)
    total = (c.original_size - (1 if c.is_odd else 0)) // 2
    for b in range(c.num_blocks):
        n = min(c.block_symbols, total - b * c.block_symbols)
        out[b, :n] = c.codebook.decode_stream_host(slab[b], 0, n)
    return out.reshape(-1)
