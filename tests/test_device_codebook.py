"""On-device codebook construction (ops/device_codebook.py) vs the host
two-queue builder.

The device builder is boundary package-merge: its lengths must be exactly
optimal (same total payload bits as the host builder — any optimal code
agrees on the total) and Kraft-tight; its canonical tables must match
Codebook.from_lengths bit for bit on the same length table."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from huffman_tpu.codebook import Codebook, code_lengths_from_frequencies
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.device_codebook import (
    device_canonical_tables,
    device_code_lengths,
)


def _freq_case(name: str) -> np.ndarray:
    rng = np.random.default_rng(hash(name) % 2**32)
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    if name == "empty":
        return freqs
    if name == "single":
        freqs[42] = 1000
    elif name == "two":
        freqs[[1, 9]] = [3, 5]
    elif name == "zipf-small":
        idx = rng.choice(MAX_SYMBOLS, size=40, replace=False)
        freqs[idx] = np.clip(rng.zipf(1.3, size=40), 1, 1 << 20)
    elif name == "zipf-large":
        idx = rng.choice(MAX_SYMBOLS, size=4000, replace=False)
        freqs[idx] = np.clip(rng.zipf(1.2, size=4000), 1, 1 << 20)
    elif name == "full-alphabet":
        freqs[:] = rng.integers(1, 1000, size=MAX_SYMBOLS)
    elif name == "romeo":
        from huffman_tpu.container.reference_format import (
            bytes_to_symbols,
            histogram_host,
        )

        data = open("/root/reference/romeo.txt", "rb").read()
        freqs = histogram_host(bytes_to_symbols(data)[0])
    return freqs


@pytest.mark.parametrize(
    "name",
    ["empty", "single", "two", "zipf-small", "zipf-large", "full-alphabet", "romeo"],
)
def test_device_lengths_optimal_and_tables_match(name):
    freqs = _freq_case(name)
    host_len = code_lengths_from_frequencies(freqs)
    dev_len = np.asarray(device_code_lengths(freqs.astype(np.int32)))

    # Optimality: identical total payload bits (any optimal code agrees).
    host_bits = int((freqs * host_len.astype(np.int64)).sum())
    dev_bits = int((freqs * dev_len.astype(np.int64)).sum())
    assert dev_bits == host_bits

    n = int((freqs > 0).sum())
    if n > 1:
        kraft = float((2.0 ** -dev_len[dev_len > 0].astype(np.float64)).sum())
        assert abs(kraft - 1.0) < 1e-9
    elif n == 1:
        assert dev_len[freqs > 0][0] == 1  # degenerate 1-bit code
    assert (dev_len[freqs == 0] == 0).all()

    # Canonical tables on the device lengths == host Codebook on them.
    cb = Codebook.from_lengths(dev_len.astype(np.uint8))
    enc_codes, enc_lens, lj, base, sym_rank = (
        np.asarray(x) for x in device_canonical_tables(jnp.asarray(dev_len))
    )
    assert np.array_equal(enc_codes, cb.codes)
    assert np.array_equal(enc_lens, cb.lengths.astype(np.int32))
    assert np.array_equal(lj, cb.lj_limit)
    assert np.array_equal(base, (cb.base & 0xFFFFFFFF).astype(np.uint32))
    if n:
        sym_order = np.zeros(cb.n_unique, dtype=np.int64)
        sym_order[sym_rank[dev_len > 0]] = np.flatnonzero(dev_len > 0)
        assert np.array_equal(sym_order, cb.sym_order.astype(np.int64))


def test_length_limit_enforced():
    """Fibonacci-skewed frequencies would build a deep tree; the device
    builder must cap at the requested limit with an optimal limited code.
    (The reference would silently wrap lengths > 255, SURVEY.md §4.)"""
    fib = [1, 1]
    while len(fib) < 40:
        fib.append(fib[-1] + fib[-2])
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    freqs[: len(fib)] = fib
    for limit in (8, 12):
        dev_len = np.asarray(
            device_code_lengths(freqs.astype(np.int32), max_len=limit)
        )
        assert dev_len.max() <= limit
        kraft = float((2.0 ** -dev_len[dev_len > 0].astype(np.float64)).sum())
        assert abs(kraft - 1.0) < 1e-9  # still a tight prefix code


def test_roundtrip_through_device_codebook():
    """Encode with the device-built codebook, decode with the host twin."""
    rng = np.random.default_rng(9)
    symbols = rng.choice(
        np.arange(500, dtype=np.uint16), size=20000,
        p=(lambda p: p / p.sum())(1.0 / np.arange(1, 501) ** 1.1),
    ).astype(np.uint16)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    dev_len = np.asarray(device_code_lengths(freqs.astype(np.int32)))
    cb = Codebook.from_lengths(dev_len.astype(np.uint8))
    from huffman_tpu.bitio import pack_codes

    codes, lens = cb.encode_symbols_host(symbols)
    words, nbits = pack_codes(codes, lens)
    out = cb.decode_stream_host(words, 0, symbols.size)
    assert np.array_equal(out, symbols)
