"""Native block container tests (both backends, edge cases, corruption)."""

import numpy as np
import pytest

import huffman_tpu as ht
from huffman_tpu.container import block_format as bf


@pytest.mark.parametrize("backend", ["jax", "numpy"])
@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"ab",
        b"zz" * 100,                       # single unique symbol
        b"hello huffman " * 1000 + b"!",   # odd, multi-block at B=512
        bytes(range(256)) * 8,
    ],
    ids=["empty", "one-byte", "one-pair", "single-symbol", "odd-multiblock", "dense"],
)
def test_roundtrip(data, backend):
    blob = bf.compress(data, backend=backend, block_symbols=512)
    assert bf.decompress(blob, backend=backend) == data


def test_backends_produce_identical_containers():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    assert bf.compress(data, backend="jax", block_symbols=512) == bf.compress(
        data, backend="numpy", block_symbols=512
    )


def test_cross_backend_roundtrip():
    data = (b"the quick brown fox " * 500)[:9999]
    blob = bf.compress(data, backend="numpy", block_symbols=256)
    assert bf.decompress(blob, backend="jax") == data
    blob = bf.compress(data, backend="jax", block_symbols=256)
    assert bf.decompress(blob, backend="numpy") == data


def test_native_beats_reference_size(romeo_bytes):
    from huffman_tpu.container import reference_format as rf

    native = ht.compress(romeo_bytes)
    ref = rf.compress(romeo_bytes)
    assert len(native) < len(ref)  # lengths-only codebook + tiny offsets
    assert ht.decompress(native) == romeo_bytes


def test_crc_detects_corruption():
    data = b"payload payload payload " * 100
    blob = bytearray(ht.compress(data))
    # Flip a bit in the first payload word (the container tail can hold
    # trailing garbage-refill words a decoder never consumes, where a flip
    # would be invisible by construction).
    n_unique = int.from_bytes(blob[24:28], "little")
    payload_off = 32 + 128 + 2 * n_unique + 4 + 4  # header+counts+syms+ngroups+1 count
    blob[payload_off] ^= 0x40
    with pytest.raises(ValueError, match="CRC|corrupt"):
        ht.decompress(bytes(blob))


def test_rejects_wrong_magic():
    with pytest.raises(ValueError, match="HTPU"):
        ht.decompress(b"\x00" * 64)


def test_rejects_truncated():
    blob = ht.compress(b"some data here")
    with pytest.raises(Exception):
        ht.decompress(blob[: len(blob) // 2])


def test_public_api_roundtrip(romeo_bytes):
    blob = ht.compress(romeo_bytes)
    assert ht.decompress(blob) == romeo_bytes
    ref = ht.compress_reference(romeo_bytes)
    assert ht.decompress_reference(ref) == romeo_bytes


def test_stored_mode_for_incompressible(jpeg_bytes):
    """Incompressible input falls back to stored mode: 32-byte overhead
    instead of the reference's ~10% inflation (its jpeg grows 3,081,163 ->
    3,390,172 B; SURVEY.md §6)."""
    blob = bf.compress(jpeg_bytes, backend="numpy")
    assert len(blob) == len(jpeg_bytes) + 32
    assert bf.decompress(blob, backend="numpy") == jpeg_bytes


def test_stored_mode_random_bytes():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 100001, dtype=np.uint8).tobytes()
    blob = bf.compress(data, backend="numpy")
    assert len(blob) <= len(data) + 32
    assert bf.decompress(blob, backend="numpy") == data


def test_stored_mode_crc():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    blob = bytearray(bf.compress(data, backend="numpy"))
    assert blob[5] & 4  # stored
    blob[100] ^= 1
    with pytest.raises(ValueError, match="CRC|corrupt"):
        bf.decompress(bytes(blob), backend="numpy")
