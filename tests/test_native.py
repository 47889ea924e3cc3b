"""Native C++ host runtime tests: bit-exact equivalence with the Python
twins, plus interop with the compiled reference binaries.

The native runtime (native/htpu_native.cpp) replaces the reference's C++
host components (container writer Compressor.cu:634-700, sequential decoder
Decompressor.cu, two-queue builder baseline/Compressor.cu:118-164)."""

import subprocess

import numpy as np
import pytest

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.container import block_format as bf
from huffman_tpu.container import interleave as il
from huffman_tpu.container import reference_format as rf
from huffman_tpu.ops.pallas_decode import GROUP_LANES
from huffman_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not buildable here"
)

CASES = {
    "empty": b"",
    "one-byte": b"q",
    "one-pair": b"ab",
    "single-symbol": b"zz" * 321,
    "odd-tail": b"ab" * 300 + b"x",
    "dense": bytes(range(256)) * 7,
}


def _python_code_lengths(freqs):
    """The pure-NumPy two-queue path (bypassing the native dispatch)."""
    from unittest import mock

    with mock.patch.object(native, "available", return_value=False):
        from huffman_tpu.codebook import code_lengths_from_frequencies

        return code_lengths_from_frequencies(freqs)


@pytest.mark.parametrize("name", list(CASES))
def test_compress_bit_identical_to_python(name):
    data = CASES[name]
    assert native.compress_reference(data) == rf.compress(data)


@pytest.mark.parametrize("name", list(CASES))
def test_decompress_roundtrip(name):
    data = CASES[name]
    blob = native.compress_reference(data)
    assert native.decompress_reference(blob) == data
    assert rf.decompress(blob) == data


def test_code_lengths_match_python():
    rng = np.random.default_rng(3)
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    idx = rng.choice(MAX_SYMBOLS, size=5000, replace=False)
    freqs[idx] = rng.zipf(1.3, size=idx.size)
    assert np.array_equal(native.code_lengths(freqs), _python_code_lengths(freqs))


def test_histogram_matches_numpy():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, size=100001, dtype=np.uint8).tobytes()
    symbols, _, _ = rf.bytes_to_symbols(data)
    assert np.array_equal(native.histogram(data), rf.histogram_host(symbols))


def test_romeo_exact_sizes(romeo_bytes):
    blob = native.compress_reference(romeo_bytes)
    assert len(blob) == 91732  # reference ground truth (BASELINE.md)
    assert native.decompress_reference(blob) == romeo_bytes


def test_decode_reference_produced_container(romeo_bytes, ref_archive, tmp_path):
    """The native decoder must handle the reference's own (non-canonical)
    code assignment, not just ours."""
    if ref_archive is None:
        pytest.skip("reference compressor not buildable here")
    src = tmp_path / "romeo.txt"
    src.write_bytes(romeo_bytes)
    subprocess.run([str(ref_archive), str(src)], check=True, capture_output=True, cwd=tmp_path)
    blob = (tmp_path / "romeo.txt.compressed").read_bytes()
    assert native.decompress_reference(blob) == romeo_bytes


def test_native_compress_to_reference_extract(romeo_bytes, ref_extract, tmp_path):
    if ref_extract is None:
        pytest.skip("reference decompressor not buildable here")
    comp = tmp_path / "ours.compressed"
    comp.write_bytes(native.compress_reference(romeo_bytes))
    subprocess.run([str(ref_extract), str(comp)], check=True, capture_output=True, cwd=tmp_path)
    assert (tmp_path / "DECOMPRESSED_FILE").read_bytes() == romeo_bytes


def test_interleave_build_and_decode_match_numpy():
    rng = np.random.default_rng(5)
    data = rng.choice(
        np.arange(200, dtype=np.uint16), size=40000, p=None
    ).astype("<u2").tobytes()
    symbols, _, _ = rf.bytes_to_symbols(data)
    B = 64
    n_real = (symbols.size + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    cb = Codebook.from_frequencies(rf.histogram_host(symbols))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, symbols.size, min_len, n_lanes, B)

    s_py = il.build_interleaved_streams(slab, eff, n_real)
    s_c = native.interleave_build(slab, eff, n_real)
    assert len(s_py) == len(s_c)
    for a, b in zip(s_py, s_c):
        assert np.array_equal(a, b)

    d_py = il.decode_interleaved_numpy(s_py[0], cb, B, min(GROUP_LANES, n_real))
    d_c = native.interleave_decode(s_c[0], cb, B, min(GROUP_LANES, n_real))
    assert np.array_equal(d_py.astype(np.int64), d_c.astype(np.int64))


def test_block_container_native_backend_roundtrip():
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, size=123457, dtype=np.uint8).tobytes()
    blob = bf.compress(data, backend="numpy")
    assert bf.decompress(blob, backend="numpy") == data


@pytest.mark.parametrize("threads", ["2", "3", "7"])
def test_parallel_ref_compress_bit_identical(threads, monkeypatch, romeo_bytes):
    """The chunked parallel payload writer (seam bytes OR-merged) must stay
    bit-identical at any thread count — forced via HTPU_THREADS since this
    box exposes one core."""
    monkeypatch.setenv("HTPU_THREADS", threads)
    blob = native.compress_reference(romeo_bytes)
    monkeypatch.setenv("HTPU_THREADS", "1")
    ref = native.compress_reference(romeo_bytes)
    assert blob == ref
    assert native.decompress_reference(blob) == romeo_bytes


def test_parallel_histogram_and_interleave_threads(monkeypatch):
    rng = np.random.default_rng(8)
    data = (rng.zipf(1.5, size=200001) % 250).astype(np.uint8).tobytes()
    symbols, _, _ = rf.bytes_to_symbols(data)
    monkeypatch.setenv("HTPU_THREADS", "5")
    h = native.histogram(data)
    assert np.array_equal(h, rf.histogram_host(symbols))
    blob = bf.compress(data, backend="numpy")
    assert bf.decompress(blob, backend="numpy") == data
