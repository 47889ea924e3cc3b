"""Pallas pack kernel vs the NumPy bit-pack twin (interpreter on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from huffman_tpu.bitio import pack_codes_blocked
from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.pallas_decode import GROUP_LANES
from huffman_tpu.ops.pallas_encode import pack_blocks_pallas


@pytest.mark.parametrize(
    "seed,npairs,nalpha,B",
    [(1, 40000, 300, 32), (2, 5000, 2, 16), (3, 70000, 4000, 64), (4, 999, 1, 8)],
)
def test_pack_matches_numpy_twin(seed, npairs, nalpha, B):
    rng = np.random.default_rng(seed)
    alpha = rng.choice(MAX_SYMBOLS, max(nalpha, 1), replace=False)
    if nalpha > 1:
        p = 1.0 / np.arange(1, nalpha + 1) ** 1.2
        p /= p.sum()
        symbols = rng.choice(alpha, npairs, p=p).astype(np.uint16)
    else:
        symbols = np.full(npairs, alpha[0], np.uint16)
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    padded = np.zeros(n_lanes * B, np.uint16)
    padded[:npairs] = symbols
    codes, lens = cb.encode_symbols_host(padded)
    lens[npairs:] = 0
    codes = np.where(lens == 0, 0, codes)
    codes2 = codes.reshape(n_lanes, B)
    lens2 = lens.reshape(n_lanes, B)
    W = 64
    ref, _ = pack_codes_blocked(codes2, lens2, W)
    out = np.asarray(
        pack_blocks_pallas(
            codes2.astype(np.uint32), lens2.astype(np.int32), W, interpret=True
        )
    )
    assert np.array_equal(out, ref)
