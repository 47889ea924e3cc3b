import numpy as np
import pytest

from huffman_tpu.bitio import (
    BitReader,
    BitWriter,
    bytes_to_u32_msb,
    pack_codes,
    u32_msb_to_bytes,
)


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(0)
    fields = [(int(rng.integers(0, 1 << n)), n) for n in rng.integers(1, 33, 200)]
    w = BitWriter()
    for v, n in fields:
        w.write(v, int(n))
    blob = w.getvalue()
    r = BitReader(blob)
    for v, n in fields:
        assert r.read(int(n)) == v


def test_writer_left_aligned_flush():
    w = BitWriter()
    w.write(0b101, 3)
    assert w.getvalue() == bytes([0b10100000])


def test_writer_rejects_oversized_value():
    w = BitWriter()
    with pytest.raises(ValueError):
        w.write(4, 2)


def test_pack_codes_matches_scalar_writer():
    rng = np.random.default_rng(1)
    lengths = rng.integers(1, 33, 500)
    codes = np.array([rng.integers(0, 1 << l) for l in lengths], dtype=np.uint64)
    for start in (0, 3, 8, 13):
        w = BitWriter()
        w.write(0, start) if start else None
        for c, l in zip(codes, lengths):
            w.write(int(c), int(l))
        expected = w.getvalue()
        words, nbits = pack_codes(codes, lengths, start_bit=start)
        assert nbits == start + int(lengths.sum())
        assert u32_msb_to_bytes(words, nbits) == expected


def test_pack_codes_zero_length_entries():
    codes = np.array([0b1, 0, 0b01], dtype=np.uint64)
    lengths = np.array([1, 0, 2])
    words, nbits = pack_codes(codes, lengths)
    assert nbits == 3
    assert u32_msb_to_bytes(words, nbits) == bytes([0b10100000])


def test_pack_codes_blocked_matches_per_block_pack():
    rng = np.random.default_rng(7)
    nblocks, B = 5, 64
    lengths = rng.integers(0, 33, (nblocks, B))
    codes = np.array(
        [[rng.integers(0, 1 << l) if l else 0 for l in row] for row in lengths],
        dtype=np.uint64,
    )
    from huffman_tpu.bitio import pack_codes_blocked

    W = int((lengths.sum(axis=1).max() + 31) // 32) + 1
    slab, bits = pack_codes_blocked(codes, lengths, W)
    for b in range(nblocks):
        words, nbits = pack_codes(codes[b], lengths[b])
        assert bits[b] == nbits
        np.testing.assert_array_equal(slab[b, : words.size], words)
        assert not slab[b, words.size :].any()


def test_bytes_u32_roundtrip():
    data = bytes(range(1, 14))
    words = bytes_to_u32_msb(data)
    assert u32_msb_to_bytes(words, len(data) * 8) == data
