"""Reader/writer for the reference ``.compressed`` container format.

Format (reverse-engineered from the reference and verified bit-exact by
round-tripping against its compiled binaries — see tests/):

* bytes [0:2): unique-symbol count, little-endian u16 (0 encodes 65536)
  (reference: Compressor.cu:434, Decompressor.cu:69-71)
* byte [2]: isOdd flag; if set, byte [3] is the raw last input byte
  (Compressor.cu:438-443, Decompressor.cu:74-80)
* then ONE continuous MSB-first bitstream (Compressor.cu:637-656 writer
  semantics; Decompressor.cu:129-182 readers):
  - per unique symbol: 16-bit symbol (hi byte first), 8-bit code length
    (0 encodes 65536 — never emitted by us), then the code bits
  - 64-bit original file size, least-significant *byte* first
  - payload: concatenated codewords of each input byte pair in order
  - final partial byte left-aligned (Compressor.cu:597-601).

We emit **canonical** codes (any prefix code decodes identically through
the reference's tree rebuild, Decompressor.cu:129-163) in ascending
(frequency, symbol) order. Known reference bugs fixed here (SURVEY.md §4):
empty and single-pair inputs get a dummy table entry so the count field
never collapses to 0≡65536; single-unique-symbol inputs get a length-1 code
instead of the reference's broken length-0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitio import BitReader, BitWriter, bytes_to_u32_msb, pack_codes, u32_msb_to_bytes
from ..codebook import Codebook
from ..constants import MAX_SYMBOLS


def bytes_to_symbols(data: bytes | np.ndarray) -> tuple[np.ndarray, bool, int]:
    """Split raw bytes into 16-bit little-endian byte-pair symbols.

    Returns (symbols, is_odd, last_byte). Mirrors the reference symbol
    model (Compressor.cu:45: ``(data[2i+1] << 8) | data[2i]``).
    """
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    is_odd = buf.size % 2 == 1
    last_byte = int(buf[-1]) if is_odd else 0
    pairs = buf[: buf.size - (buf.size % 2)]
    symbols = pairs.view("<u2").astype(np.uint16)
    return symbols, is_odd, last_byte


def symbols_to_bytes(symbols: np.ndarray, is_odd: bool, last_byte: int) -> bytes:
    out = np.asarray(symbols, dtype="<u2").tobytes()
    if is_odd:
        out += bytes([last_byte])
    return out


def histogram_host(symbols: np.ndarray) -> np.ndarray:
    """Dense 65,536-bin histogram (host twin of ops/histogram.py): the
    native C runtime when available (np.bincount measured ~800 ms per
    8.4M int64 symbols on this box; the C loop is ~20x faster), NumPy
    otherwise."""
    try:
        from ..runtime import native

        if native.available():
            return native.histogram(
                np.ascontiguousarray(symbols, dtype="<u2").view(np.uint8)
            )
    except ImportError:
        pass
    return np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int64)


def compress(
    data: bytes, codebook: Codebook | None = None, device_payload: bool = False
) -> bytes:
    """Compress raw bytes into the reference ``.compressed`` container.

    ``device_payload=True`` packs the payload bitstream on the TPU
    (ops/encode.pack_stream — the device equivalent of the reference's
    encodeFromCW kernel, Compressor.cu:182-313, for its own single-stream
    format); the header stays host-side either way."""
    symbols, is_odd, last_byte = bytes_to_symbols(data)
    freqs = histogram_host(symbols)
    if codebook is None:
        codebook = Codebook.from_frequencies(freqs)

    header = BitWriter()
    n_unique = codebook.n_unique
    emit_dummy = n_unique == 0
    count_field = 1 if emit_dummy else (n_unique & 0xFFFF)  # 65536 wraps to 0
    header.write_bytes_aligned(
        bytes([count_field & 0xFF, (count_field >> 8) & 0xFF, 1 if is_odd else 0])
    )
    if is_odd:
        header.write_bytes_aligned(bytes([last_byte]))

    if emit_dummy:
        # No payload symbols at all; reference decoder still insists on
        # count >= 1 table entries (0 means 65536).
        header.write(0, 16)
        header.write(1, 8)
        header.write(0, 1)
    else:
        # Emission order: ascending (freq, symbol) — matches the spirit of
        # the reference's frequency-sorted table; decode order-independent.
        present = codebook.sym_order.astype(np.int64)
        order = np.lexsort((present, freqs[present]))
        for sym in present[order]:
            length = int(codebook.lengths[sym])
            header.write(int(sym), 16)
            header.write(length & 0xFF, 8)  # length 256 would wrap; max is 32
            header.write(int(codebook.codes[sym]), length)

    file_size = len(data)
    for i in range(8):
        header.write((file_size >> (8 * i)) & 0xFF, 8)

    # Payload: pack all codewords starting at the current bit offset so the
    # packed words can be OR-merged with the header bytes without shifting.
    codes, lengths = codebook.encode_symbols_host(symbols)
    start_bit = header.bit_position
    if symbols.size:
        if device_payload:
            words, nbits = _pack_stream_device(symbols, codebook, start_bit)
        else:
            words, nbits = pack_codes(codes, lengths, start_bit=start_bit)
        payload = bytearray(u32_msb_to_bytes(words, nbits))
        head = header.getvalue()
        boundary = start_bit >> 3
        # Bytes before the boundary come from the header; the byte that
        # straddles the boundary is the OR of both.
        payload[:boundary] = head[:boundary]
        if start_bit & 7:
            payload[boundary] |= head[boundary]
        return bytes(payload)
    return header.getvalue()


def _pack_stream_device(symbols, codebook: Codebook, start_bit: int):
    """Pack the whole-file payload bitstream on device. Global bit offsets
    can pass 2^31, so the device sees (word, bit) offset pairs computed from
    a host cumsum (ops/encode.pack_stream contract)."""
    import jax.numpy as jnp

    from ..bitio import exclusive_cumsum
    from ..ops.encode import pack_stream
    from ..ops.tables import device_tables

    t = device_tables(codebook)
    lengths = codebook.lengths[symbols].astype(np.int64)
    offsets = exclusive_cumsum(lengths, start_bit)
    nbits = int(offsets[-1] + lengths[-1])
    total_words = (nbits + 31) >> 5
    sym_dev = jnp.asarray(symbols.astype(np.int32))
    codes, lens = (
        jnp.take(t.enc_codes, sym_dev),
        jnp.take(t.enc_lens, sym_dev),
    )
    words = pack_stream(
        codes,
        lens,
        jnp.asarray((offsets >> 5).astype(np.int32)),
        jnp.asarray((offsets & 31).astype(np.int32)),
        total_words,
    )
    return np.asarray(words), nbits


@dataclass(frozen=True)
class ReferenceHeader:
    symbols: np.ndarray      # (n,) uint16 in table order
    lengths: np.ndarray      # (n,) int64
    codes: np.ndarray        # (n,) uint64 (the format allows up to 64 bits)
    file_size: int
    is_odd: bool
    last_byte: int
    payload_bit_offset: int  # absolute bit offset of the payload in the blob


def parse_header(blob: bytes) -> ReferenceHeader:
    if len(blob) < 3:
        raise ValueError("truncated reference container")
    count = blob[0] | (blob[1] << 8)
    if count == 0:
        count = 65536
    is_odd = bool(blob[2])
    pos = 3
    last_byte = 0
    if is_odd:
        if len(blob) < 4:
            raise ValueError("truncated reference container")
        last_byte = blob[3]
        pos = 4
    reader = BitReader(blob, pos * 8)
    syms = np.empty(count, dtype=np.uint16)
    lens = np.empty(count, dtype=np.int64)
    codes = np.empty(count, dtype=np.uint64)
    for i in range(count):
        syms[i] = reader.read(16)
        length = reader.read(8)
        if length == 0:
            length = 65536
        if length > 64:
            raise ValueError(f"unsupported code length {length}")
        lens[i] = length
        codes[i] = reader.read(length)
    file_size = 0
    for i in range(8):
        file_size |= reader.read(8) << (8 * i)
    return ReferenceHeader(
        symbols=syms,
        lengths=lens,
        codes=codes,
        file_size=file_size,
        is_odd=is_odd,
        last_byte=last_byte,
        payload_bit_offset=reader.bit_position,
    )


def decode_payload_host(header: ReferenceHeader, blob: bytes) -> np.ndarray:
    """Decode the payload of an arbitrary (not necessarily canonical)
    reference container on the host.

    Generic prefix-code decode via left-justified codeword ordering: the
    left-justified codewords of any prefix code are totally ordered and the
    matching codeword for a 32-bit peek P is the greatest lj <= P. This is
    the same primitive the device decoder uses, minus the canonical
    shortcut. Slow-path Python loop; the native C++ runtime and the TPU
    block decoder are the production paths.
    """
    n_pairs = header.file_size // 2
    if header.lengths.size and header.lengths.max() > 32:
        # The format permits up to 64-bit codes; fall back to a Python-int
        # 64-bit-peek walk so foreign containers decode even without g++.
        return _decode_payload_host64(header, blob, n_pairs)
    lj = (header.codes.astype(np.uint64) << (32 - header.lengths.astype(np.uint64))) & np.uint64(
        0xFFFFFFFF
    )
    order = np.argsort(lj, kind="stable")
    lj_sorted = lj[order]
    len_sorted = header.lengths[order]
    sym_sorted = header.symbols[order]

    words = bytes_to_u32_msb(blob).astype(np.uint64)
    padded = np.concatenate([words, np.zeros(2, dtype=np.uint64)])
    out = np.empty(n_pairs, dtype=np.uint16)
    pos = header.payload_bit_offset
    for i in range(n_pairs):
        w = pos >> 5
        sh = pos & 31
        window = (padded[w] << np.uint64(32)) | padded[w + 1]
        peek = (window >> np.uint64(32 - sh)) & np.uint64(0xFFFFFFFF)
        idx = int(np.searchsorted(lj_sorted, peek, side="right")) - 1
        if idx < 0:
            # Only possible for an incomplete foreign code with no
            # all-zeros codeword: the stream is corrupt, not wrap-around.
            raise ValueError("corrupt payload: bits match no codeword")
        out[i] = sym_sorted[idx]
        pos += int(len_sorted[idx])
    return out


def _decode_payload_host64(
    header: ReferenceHeader, blob: bytes, n_pairs: int
) -> np.ndarray:
    """64-bit-window variant of decode_payload_host for foreign containers
    with code lengths in 33..64 (we never emit them; the format allows
    them, Decompressor.cu:90-97 reads length as one byte). Python-int
    arithmetic throughout — correctness fallback, not a production path."""
    import bisect

    lj = [
        (int(c) << (64 - int(l))) & 0xFFFFFFFFFFFFFFFF
        for c, l in zip(header.codes, header.lengths)
    ]
    order = sorted(range(len(lj)), key=lj.__getitem__)
    lj_sorted = [lj[i] for i in order]
    len_sorted = [int(header.lengths[i]) for i in order]
    sym_sorted = [int(header.symbols[i]) for i in order]

    padded = blob + b"\x00" * 16
    out = np.empty(n_pairs, dtype=np.uint16)
    pos = header.payload_bit_offset
    for i in range(n_pairs):
        byte = pos >> 3
        window = int.from_bytes(padded[byte : byte + 9], "big")
        peek = (window >> (72 - 64 - (pos & 7))) & 0xFFFFFFFFFFFFFFFF
        idx = bisect.bisect_right(lj_sorted, peek) - 1
        if idx < 0:
            raise ValueError("corrupt payload: bits match no codeword")
        out[i] = sym_sorted[idx]
        pos += len_sorted[idx]
    return out


def decompress(blob: bytes) -> bytes:
    header = parse_header(blob)
    symbols = decode_payload_host(header, blob)
    return symbols_to_bytes(symbols, header.is_odd, header.last_byte)
