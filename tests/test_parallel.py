"""Distribution layer tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.tables import device_tables
from huffman_tpu.parallel import pipeline as pp


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return pp.data_mesh()


def _data(seed=0, nblocks=16, B=128):
    rng = np.random.default_rng(seed)
    alphabet = rng.choice(MAX_SYMBOLS, size=100, replace=False)
    n_pairs = nblocks * B - 13
    symbols = rng.choice(alphabet, size=n_pairs).astype(np.int32)
    padded = np.zeros(nblocks * B, dtype=np.int32)
    padded[:n_pairs] = symbols
    valid = np.arange(nblocks * B) < n_pairs
    return symbols, padded.reshape(nblocks, B), valid.reshape(nblocks, B), n_pairs


def test_distributed_histogram_matches_host(mesh):
    symbols, padded, valid, n_pairs = _data()
    hist = pp.distributed_histogram(mesh, jnp.asarray(symbols))
    np.testing.assert_array_equal(
        np.asarray(hist), np.bincount(symbols, minlength=MAX_SYMBOLS)
    )


def test_full_distributed_step_roundtrips(mesh):
    symbols, padded, valid, n_pairs = _data(1)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    cb = Codebook.from_frequencies(freqs)
    t = device_tables(cb)
    B = padded.shape[1]
    W = B  # worst case

    step = pp.compress_decompress_step(mesh)
    hist, slab, bits, ok = jax.jit(
        step, static_argnames=("W", "B")
    )(
        jnp.asarray(padded),
        jnp.asarray(valid),
        t.enc_codes,
        t.enc_lens,
        t.lj_limit,
        t.base,
        t.sym_order,
        jnp.asarray(t.max_len, jnp.int32),
        W=W,
        B=B,
    )
    assert int(ok) == 1
    np.testing.assert_array_equal(np.asarray(hist)[:MAX_SYMBOLS], freqs)
    assert bits.shape == (padded.shape[0],)
    assert int(np.asarray(bits).sum()) == cb.expected_bits(freqs)


def test_distributed_encode_decode(mesh):
    symbols, padded, valid, n_pairs = _data(2)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)
    B = padded.shape[1]
    slab, bits = pp.distributed_encode(
        mesh, jnp.asarray(padded), jnp.asarray(valid), t.enc_codes, t.enc_lens, B
    )
    out = pp.distributed_decode(
        mesh, slab, t.lj_limit, t.base, t.sym_order,
        jnp.asarray(t.max_len, jnp.int32), B,
    )
    got = np.asarray(out).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(got, symbols)
