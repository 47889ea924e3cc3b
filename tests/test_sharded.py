"""Sharded HTPX archive: roundtrips in both codebook modes, including the
distributed (psum-histogram) path on the virtual 8-device mesh."""

import numpy as np
import pytest

from huffman_tpu.container import sharded


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(4)
    return (rng.zipf(1.4, size=100001) % 240).astype(np.uint8).tobytes()


@pytest.mark.parametrize("n_shards", [1, 3, 8])
@pytest.mark.parametrize("mode", ["global", "per-shard"])
def test_roundtrip(data, n_shards, mode):
    blob = sharded.compress(
        data, n_shards=n_shards, codebook_mode=mode, backend="numpy"
    )
    assert sharded.decompress(blob, backend="numpy") == data


def test_global_codebook_on_mesh(data):
    jax = pytest.importorskip("jax")
    from huffman_tpu.parallel.pipeline import data_mesh

    mesh = data_mesh()
    blob = sharded.compress(
        data, n_shards=4, codebook_mode="global", mesh=mesh, backend="numpy"
    )
    assert sharded.decompress(blob, backend="numpy") == data
    # Global mode with identical data must match the meshless build exactly.
    ref = sharded.compress(data, n_shards=4, codebook_mode="global", backend="numpy")
    assert blob == ref


def test_global_beats_pershard_on_homogeneous_data(data):
    g = sharded.compress(data, n_shards=8, codebook_mode="global", backend="numpy")
    p = sharded.compress(data, n_shards=8, codebook_mode="per-shard", backend="numpy")
    assert len(g) != 0 and len(p) != 0
    # Global mode stores ONE symbol table at the archive level; per-shard
    # mode embeds a table in all 8 inners. On homogeneous data global must
    # win (payload bits near-identical, table paid once).
    assert len(g) < len(p)


def test_truncation_raises(data):
    blob = sharded.compress(data, n_shards=2, backend="numpy")
    for cut in (3, 10, 25, len(blob) - 5):
        with pytest.raises(ValueError):
            sharded.decompress(blob[:cut], backend="numpy")


def test_odd_tail(data):
    odd = data + b"z"
    blob = sharded.compress(odd, n_shards=3, backend="numpy")
    assert sharded.decompress(blob, backend="numpy") == odd
