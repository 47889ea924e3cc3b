"""Property soak: randomized configurations across every format and
backend must round-trip and agree with each other.

This is the broad regression net for future rounds: formats (reference /
HTPU v1 / HTPU v2 / HTPX / HTPS), data shapes (empty, tiny, odd, skewed,
dense, single-symbol runs), block sizes, and backend pairs."""

import io

import numpy as np
import pytest

from huffman_tpu import api
from huffman_tpu.container import block_format as bf
from huffman_tpu.container import reference_format as rf
from huffman_tpu.container import sharded, streaming


def _gen(rng) -> bytes:
    kind = rng.integers(0, 6)
    n = int(rng.integers(0, 60000))
    if kind == 0:
        return b""
    if kind == 1:  # skewed text-like
        alpha = int(rng.integers(2, 300))
        return (rng.zipf(1.4, size=n) % alpha).astype(np.uint8).tobytes()
    if kind == 2:  # dense random
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 3:  # long single-symbol runs
        return bytes([int(rng.integers(0, 256))]) * n
    if kind == 4:  # sparse alphabet with odd tail
        return (rng.integers(0, 4, n, dtype=np.uint8) * 63).tobytes() + b"q"
    # structured: repeating record
    rec = rng.integers(0, 256, 37, dtype=np.uint8).tobytes()
    return rec * (n // 37 + 1)


@pytest.mark.parametrize("seed", range(8))
def test_soak(seed):
    rng = np.random.default_rng(1000 + seed)
    for trial in range(6):
        data = _gen(rng)
        B = int(rng.choice([16, 64, 256, 512]))

        ref = rf.compress(data)
        assert rf.decompress(ref) == data

        v2 = bf.compress(data, backend="numpy", block_symbols=B)
        assert bf.decompress(v2, backend="numpy") == data
        v1 = bf.compress(data, backend="numpy", block_symbols=B, mode="blocks")
        assert bf.decompress(v1, backend="numpy") == data

        n_shards = int(rng.integers(1, 5))
        mode = rng.choice(["global", "per-shard"])
        x = sharded.compress(
            data, n_shards=n_shards, codebook_mode=str(mode), backend="numpy"
        )
        assert sharded.decompress(x, backend="numpy") == data

        s = streaming.compress_bytes(
            data, chunk_bytes=int(rng.choice([512, 4096, 1 << 16])),
            backend="numpy",
        )
        assert streaming.decompress_bytes(s, backend="numpy") == data

        # api dispatch agrees on every blob kind
        for blob in (v2, x, s):
            assert api.decompress(blob, backend="numpy") == data

        # jax backend (Pallas kernels through the interpreter on CPU;
        # scripts/chip_check.py re-proves them on real hardware): small
        # inputs only, the interpreter is slow
        if len(data) <= 20000:
            vj = bf.compress(data, backend="jax", block_symbols=B)
            assert vj == bf.compress(data, backend="numpy", block_symbols=B)
            assert bf.decompress(vj, backend="jax") == data


def test_native_python_writer_equivalence_soak():
    """Native and Python reference-format writers stay bit-identical over
    random inputs (the interop invariant)."""
    from huffman_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(77)
    for _ in range(10):
        data = _gen(rng)
        assert native.compress_reference(data) == rf.compress(data)
        assert native.decompress_reference(rf.compress(data)) == data
