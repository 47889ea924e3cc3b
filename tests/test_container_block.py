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


def test_fused_container_matches_host():
    """The whole-pipeline fused device encode (_compress_v2_fused — here
    in interpret mode with a small explicit cap so the CPU interpreter
    stays fast) emits a container BYTE-IDENTICAL to the host path: the
    codebook single-sourcing (cap-invariant package-merge on both sides)
    plus the chip-checked interleave protocol. On hardware the same
    identity is asserted by scripts/chip_check.py over the real tiers."""
    from huffman_tpu.container.reference_format import bytes_to_symbols

    rng = np.random.default_rng(9)
    a = rng.choice(65536, 300, replace=False).astype(np.uint16)
    p = 1.0 / np.arange(1, 301) ** 1.2
    p /= p.sum()
    base = rng.choice(a, 60000, p=p).astype("<u2").tobytes()
    for data in (base, base + b"\x07"):  # even and odd byte lengths
        host = bf.compress(data, backend="numpy", block_symbols=512)
        symbols, is_odd, last_byte = bytes_to_symbols(data)
        B = 512
        nblocks = (symbols.size + B - 1) // B
        blob, cb = bf._compress_v2_fused(
            data, symbols, is_odd, last_byte, B, nblocks, 18,
            interpret=True, alphabet_cap=4096,
        )
        assert blob == host
        assert cb.max_len <= 18
        assert bf.decompress(blob, backend="numpy") == data


def test_fused_container_cap_overflow_raises():
    """An explicit (test-only) alphabet cap that this input's alphabet
    overflows must raise, never emit garbage container bytes."""
    from huffman_tpu.container.reference_format import bytes_to_symbols

    rng = np.random.default_rng(11)
    data = rng.integers(0, 65536, 40000, dtype=np.uint16).astype("<u2").tobytes()
    symbols, is_odd, last_byte = bytes_to_symbols(data)
    B = 512
    nblocks = (symbols.size + B - 1) // B
    with pytest.raises(ValueError, match="alphabet cap"):
        bf._compress_v2_fused(
            data, symbols, is_odd, last_byte, B, nblocks, 18,
            interpret=True, alphabet_cap=1024,
        )


def test_host_codebook_is_package_merge():
    """With max_code_len set (the default), the host container codebook is
    the optimal length-limited package-merge code — the same construction
    the fused device path runs, single-sourced for byte-identity."""
    from huffman_tpu.ops.device_codebook import device_code_lengths

    data = (b"abracadabra " * 3000)[:30001]
    blob = bf.compress(data, backend="numpy")
    c = bf.ParsedContainer(blob)
    from huffman_tpu.container.reference_format import bytes_to_symbols, histogram_host

    freqs = histogram_host(bytes_to_symbols(data)[0])
    want = np.asarray(
        device_code_lengths(freqs.astype(np.int32), max_len=18,
                            alphabet_cap=4096)
    ).astype(np.uint8)
    assert np.array_equal(c.codebook.lengths, want)
