"""Streaming HTPS container: bounded-memory chunked roundtrips."""

import io

import numpy as np
import pytest

from huffman_tpu.container import streaming


@pytest.mark.parametrize("n,chunk", [(0, 1024), (1, 1024), (5000, 512),
                                     (100001, 4096), (65537, 65536)])
def test_roundtrip(n, chunk):
    rng = np.random.default_rng(n)
    data = (rng.zipf(1.5, size=n) % 251).astype(np.uint8).tobytes()
    blob = streaming.compress_bytes(data, chunk_bytes=chunk, backend="numpy")
    assert streaming.decompress_bytes(blob, backend="numpy") == data


def test_memory_bounded_interfaces():
    """Compression through real file objects, chunk by chunk."""
    rng = np.random.default_rng(7)
    data = (rng.zipf(1.4, size=300000) % 240).astype(np.uint8).tobytes()
    src, comp = io.BytesIO(data), io.BytesIO()
    streaming.compress_stream(src, comp, chunk_bytes=1 << 16, backend="numpy")
    comp.seek(0)
    out = io.BytesIO()
    n = streaming.decompress_stream(comp, out, backend="numpy")
    assert n == len(data)
    assert out.getvalue() == data


def test_truncation_and_corruption():
    data = b"stream me " * 5000
    blob = streaming.compress_bytes(data, chunk_bytes=1 << 14, backend="numpy")
    for cut in (2, 9, 20, len(blob) // 2, len(blob) - 5):
        with pytest.raises(ValueError):
            streaming.decompress_bytes(blob[:cut], backend="numpy")
    bad = bytearray(blob)
    bad[-2] ^= 1  # stream CRC
    with pytest.raises(ValueError):
        streaming.decompress_bytes(bytes(bad), backend="numpy")


def test_odd_chunk_boundaries():
    data = bytes(range(256)) * 41 + b"x"
    blob = streaming.compress_bytes(data, chunk_bytes=1000, backend="numpy")
    assert streaming.decompress_bytes(blob, backend="numpy") == data
