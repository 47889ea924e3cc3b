import heapq

import numpy as np
import pytest

from huffman_tpu.bitio import pack_codes
from huffman_tpu.codebook import Codebook, code_lengths_from_frequencies
from huffman_tpu.constants import MAX_SYMBOLS


def _optimal_cost_heap(freqs: np.ndarray) -> int:
    """Independent O(n log n) heap Huffman for cross-checking optimality."""
    heap = [int(f) for f in freqs[freqs > 0]]
    heapq.heapify(heap)
    if len(heap) == 1:
        return heap[0]  # single symbol: 1 bit each
    cost = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    return cost


def _random_freqs(rng, n_symbols, skew):
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    syms = rng.choice(MAX_SYMBOLS, size=n_symbols, replace=False)
    freqs[syms] = np.maximum(1, (rng.pareto(skew, n_symbols) * 100).astype(np.int64))
    return freqs


@pytest.mark.parametrize("n_symbols,skew", [(2, 1.0), (7, 0.5), (300, 1.5), (5000, 0.8)])
def test_two_queue_lengths_are_optimal(n_symbols, skew):
    rng = np.random.default_rng(n_symbols)
    freqs = _random_freqs(rng, n_symbols, skew)
    lengths = code_lengths_from_frequencies(freqs)
    cost = int(np.sum(freqs * lengths.astype(np.int64)))
    assert cost == _optimal_cost_heap(freqs)
    # Kraft equality for a complete optimal code.
    kraft = np.sum(2.0 ** (-lengths[lengths > 0].astype(np.float64)))
    assert kraft == pytest.approx(1.0)


def test_single_symbol_gets_length_one():
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    freqs[42] = 1000
    lengths = code_lengths_from_frequencies(freqs)
    assert lengths[42] == 1
    assert lengths.sum() == 1
    cb = Codebook.from_lengths(lengths)
    assert cb.codes[42] == 0


def test_empty_frequencies():
    lengths = code_lengths_from_frequencies(np.zeros(MAX_SYMBOLS, dtype=np.int64))
    assert lengths.sum() == 0
    cb = Codebook.from_lengths(lengths)
    assert cb.n_unique == 0


def test_canonical_codes_are_prefix_free_and_ordered():
    rng = np.random.default_rng(3)
    freqs = _random_freqs(rng, 1000, 1.0)
    cb = Codebook.from_frequencies(freqs)
    present = cb.sym_order.astype(np.int64)
    lens = cb.lengths[present].astype(np.int64)
    lj = cb.codes[present].astype(np.uint64) << (32 - lens).astype(np.uint64)
    # Canonical order => left-justified codes strictly increase.
    assert np.all(np.diff(lj.astype(np.int64)) > 0)
    # Prefix-free: next code starts at or after the end of this code's range.
    ends = lj + (np.uint64(1) << (32 - lens).astype(np.uint64))
    assert np.all(ends[:-1].astype(np.int64) <= lj[1:].astype(np.int64))


@pytest.mark.parametrize("seed", range(4))
def test_host_encode_decode_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n_syms = int(rng.integers(2, 400))
    alphabet = rng.choice(MAX_SYMBOLS, size=n_syms, replace=False).astype(np.uint16)
    symbols = rng.choice(alphabet, size=5000).astype(np.uint16)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    cb = Codebook.from_frequencies(freqs)
    codes, lengths = cb.encode_symbols_host(symbols)
    words, nbits = pack_codes(codes, lengths)
    assert nbits == cb.expected_bits(freqs)
    decoded = cb.decode_stream_host(words, 0, symbols.size)
    np.testing.assert_array_equal(decoded, symbols)


def test_decode_all_ones_peek_clamps_to_max_len():
    # Dyadic frequencies -> the deepest code is all-ones; a peek of
    # 0xFFFFFFFF must clamp to max_len rather than overcounting.
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    freqs[[1, 2, 3]] = [2, 1, 1]
    cb = Codebook.from_frequencies(freqs)
    assert cb.max_len == 2
    deepest = cb.sym_order[-1]
    n = 16
    symbols = np.full(n, deepest, dtype=np.uint16)
    codes, lengths = cb.encode_symbols_host(symbols)
    words, _ = pack_codes(codes, lengths)
    np.testing.assert_array_equal(cb.decode_stream_host(words, 0, n), symbols)


def test_depth_limited_fallback_kraft_equality():
    """Fibonacci-skewed frequencies force an optimal depth > MAX_CODE_LEN;
    the limited fallback must produce an exactly-Kraft-complete code (the
    canonical builder rejects anything else) identical between the native
    and Python builders (both boundary package-merge)."""
    import numpy as np
    from unittest import mock

    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.runtime import native

    fib = [1, 1]
    while len(fib) < 50:
        fib.append(fib[-1] + fib[-2])
    freqs = np.zeros(MAX_SYMBOLS, np.int64)
    freqs[100:150] = fib

    with mock.patch.object(native, "available", return_value=False):
        from huffman_tpu.codebook import code_lengths_from_frequencies

        py = code_lengths_from_frequencies(freqs)
    assert py.max() == 32
    cb = Codebook.from_lengths(py)  # strict Kraft-equality gate
    assert cb.max_len == 32

    if native.available():
        assert np.array_equal(native.code_lengths(freqs), py)


def test_package_merge_clamps_limit_to_max_code_len():
    """max_len > MAX_CODE_LEN clamps to 32 (nothing downstream can
    represent longer codes; L=32 equals unrestricted Huffman for every
    physical input) — Codebook.from_lengths must accept the result."""
    import numpy as np

    from huffman_tpu.codebook import Codebook, package_merge_lengths

    freqs = np.zeros(65536, np.int64)
    fib = [1, 1]
    for _ in range(42):
        fib.append(fib[-1] + fib[-2])
    freqs[:44] = fib[:44]  # Fibonacci skew: natural depths > 32
    lengths = package_merge_lengths(freqs, 40)
    assert lengths.max() == 32
    Codebook.from_lengths(lengths)  # must not raise


def test_package_merge_infeasible_limit_raises():
    """A depth limit too small for the alphabet must raise, not silently
    emit a non-prefix (Kraft > 1) code."""
    import numpy as np
    import pytest

    from huffman_tpu.codebook import package_merge_lengths

    freqs = np.zeros(65536, np.int64)
    freqs[:600] = np.arange(1, 601)
    with pytest.raises(ValueError, match="cannot encode"):
        package_merge_lengths(freqs, 9)
    # and the container surfaces it rather than writing a corrupt blob
    from huffman_tpu.container import block_format as bf

    data = bytes(np.random.default_rng(0).integers(0, 256, 4096, dtype=np.uint8))
    with pytest.raises(ValueError, match="cannot encode"):
        bf.compress(data, backend="numpy", max_code_len=8)
