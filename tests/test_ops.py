"""Kernel-level unit tests: device ops vs NumPy references (SURVEY.md §4
test plan — 'kernel-level unit tests comparing histogram/scan/pack against
jnp references')."""

import jax.numpy as jnp
import numpy as np
import pytest

from huffman_tpu.bitio import pack_codes
from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops import decode as dec
from huffman_tpu.ops import encode as enc
from huffman_tpu.ops import histogram as hist
from huffman_tpu.ops.tables import device_tables


def _random_symbols(rng, n, alphabet_size=500):
    alphabet = rng.choice(MAX_SYMBOLS, size=alphabet_size, replace=False)
    return rng.choice(alphabet, size=n).astype(np.uint16)


def test_bytes_to_symbols_device_matches_host():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 4096, dtype=np.uint8)
    from huffman_tpu.container.reference_format import bytes_to_symbols

    host, _, _ = bytes_to_symbols(data.tobytes())
    dev = hist.bytes_to_symbols_device(jnp.asarray(data))
    np.testing.assert_array_equal(np.asarray(dev), host.astype(np.int32))


@pytest.mark.parametrize("method", ["scatter", "matmul"])
def test_histogram_matches_bincount(method):
    rng = np.random.default_rng(1)
    symbols = _random_symbols(rng, 10000)
    expected = np.bincount(symbols, minlength=MAX_SYMBOLS)
    got = np.asarray(hist.histogram(jnp.asarray(symbols.astype(np.int32)), method))
    np.testing.assert_array_equal(got, expected)


def test_histogram_matmul_nonmultiple_chunk():
    rng = np.random.default_rng(2)
    symbols = _random_symbols(rng, 1537)
    # symbol 0 present: padding correction must not corrupt its count
    symbols[:10] = 0
    expected = np.bincount(symbols, minlength=MAX_SYMBOLS)
    got = np.asarray(hist.histogram_matmul(jnp.asarray(symbols.astype(np.int32)), chunk=512))
    np.testing.assert_array_equal(got, expected)


def test_histogram_scatter_with_valid_count():
    symbols = jnp.array([5, 5, 7, 9, 9, 9], dtype=jnp.int32)
    got = np.asarray(hist.histogram_scatter(symbols, valid_count=jnp.int32(4)))
    assert got[5] == 2 and got[7] == 1 and got[9] == 1


@pytest.mark.parametrize("cell,cmp_dtype", [(4096, "int32"), (4096, "int8"),
                                            (8192, "int16"), (16384, "int16"),
                                            (16384, "int8")])
def test_histogram_pallas_variants_match_bincount(cell, cmp_dtype):
    """The Pallas histogram's perf knobs (cell width, narrow compare
    domain) are bit-invariant: int16 holds bytes directly and int8 wraps
    0..255 onto -128..127 bijectively, so equality survives the cast.
    Interpret mode; the chip re-proof is perf_hist.py's pre-timing check
    (NOTE: int8 compares fail MOSAIC compile on the v5e — interpret-mode
    passing here proves the math only, not chip support)."""
    from huffman_tpu.ops.pallas_hist import histogram_pallas

    rng = np.random.default_rng(5)
    # 517 past the cell multiple: exercises the pad-to-cell correction
    symbols = _random_symbols(rng, 3 * 16384 + 517, alphabet_size=3000)
    # edge bytes on both sides of the int8 wrap point, and symbol 0
    # (shares the padding-correction bin)
    symbols[:8] = [0, 127, 128, 255, 0x7F00, 0x8000, 0xFF00, 0xFFFF]
    expected = np.bincount(symbols, minlength=MAX_SYMBOLS)
    got = np.asarray(histogram_pallas(
        jnp.asarray(symbols.astype(np.int32)), interpret=True,
        cell=cell, cmp_dtype=cmp_dtype,
    ))
    np.testing.assert_array_equal(got, expected)


def _encode_blocks_host(cb, symbols, nblocks, B):
    """Pack each block independently with the NumPy bit packer."""
    slabs = []
    bits = []
    for b in range(nblocks):
        blk = symbols[b * B : (b + 1) * B]
        codes, lens = cb.encode_symbols_host(blk)
        words, nbits = pack_codes(codes, lens)
        slabs.append(words)
        bits.append(nbits)
    W = max((w.size for w in slabs), default=0)
    slab = np.zeros((nblocks, W), dtype=np.uint32)
    for b, w in enumerate(slabs):
        slab[b, : w.size] = w
    return slab, np.array(bits)


def test_pack_blocks_matches_numpy_packer():
    rng = np.random.default_rng(3)
    nblocks, B = 8, 512
    symbols = _random_symbols(rng, nblocks * B)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)

    sym_dev = jnp.asarray(symbols.astype(np.int32)).reshape(nblocks, B)
    codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens)
    offsets, block_bits = enc.block_offsets(lens)
    W = B  # static worst case (32 bits/code) keeps the jit cache warm
    slab = enc.pack_blocks(codes, lens, offsets, W)

    exp_slab, exp_bits = _encode_blocks_host(cb, symbols, nblocks, B)
    np.testing.assert_array_equal(np.asarray(block_bits), exp_bits)
    np.testing.assert_array_equal(np.asarray(slab)[:, : exp_slab.shape[1]], exp_slab)
    assert not np.any(np.asarray(slab)[:, exp_slab.shape[1] :])


def test_pack_stream_matches_numpy_packer():
    rng = np.random.default_rng(4)
    n = 3000
    symbols = _random_symbols(rng, n)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)
    start_bit = 13

    codes_h, lens_h = cb.encode_symbols_host(symbols)
    exp_words, exp_bits = pack_codes(codes_h, lens_h, start_bit=start_bit)

    sym_dev = jnp.asarray(symbols.astype(np.int32))
    codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens)
    offsets, total = enc.block_offsets(lens[None, :])
    gbit = offsets[0] + start_bit
    words = enc.pack_stream(
        codes, lens, gbit >> 5, gbit & 31, total_words=exp_words.size
    )
    np.testing.assert_array_equal(np.asarray(words), exp_words)


def test_gather_codes_masks_padding():
    cb = Codebook.from_frequencies(
        np.bincount(np.array([1, 1, 2], dtype=np.uint16), minlength=MAX_SYMBOLS)
    )
    t = device_tables(cb)
    syms = jnp.array([1, 2, 1], dtype=jnp.int32)
    valid = jnp.array([True, True, False])
    codes, lens = enc.gather_codes(syms, t.enc_codes, t.enc_lens, valid)
    assert int(lens[2]) == 0 and int(codes[2]) == 0


@pytest.mark.parametrize("seed,alphabet", [(0, 2), (1, 17), (2, 700), (3, 5000)])
def test_decode_blocks_roundtrip(seed, alphabet):
    rng = np.random.default_rng(seed)
    nblocks, B = 16, 256
    symbols = _random_symbols(rng, nblocks * B, alphabet)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)

    sym_dev = jnp.asarray(symbols.astype(np.int32)).reshape(nblocks, B)
    codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens)
    offsets, block_bits = enc.block_offsets(lens)
    W = B  # static worst case keeps the jit cache warm across seeds
    slab = enc.pack_blocks(codes, lens, offsets, W)

    out = dec.decode_blocks(slab, t.lj_limit, t.base, t.sym_order, B, t.max_len)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), symbols.astype(np.int32)
    )


def test_decode_blocks_single_symbol_codebook():
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    freqs[77] = 64
    cb = Codebook.from_frequencies(freqs)
    t = device_tables(cb)
    symbols = np.full(64, 77, dtype=np.uint16)
    sym_dev = jnp.asarray(symbols.astype(np.int32)).reshape(1, 64)
    codes, lens = enc.gather_codes(sym_dev, t.enc_codes, t.enc_lens)
    offsets, bits = enc.block_offsets(lens)
    slab = enc.pack_blocks(codes, lens, offsets, 4)
    out = dec.decode_blocks(slab, t.lj_limit, t.base, t.sym_order, 64, t.max_len)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1), symbols)
