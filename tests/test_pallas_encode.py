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


# ---------------------------------------------------------------------------
# Direct property tests for the stream packer (VERDICT r1 #6): random
# protocol lengths at the extremes, exact words_cap, pad lanes, and the
# preload/partial edge cases, compared bit-for-bit against the executable
# spec (container/interleave.build_interleaved_streams). Both the kernel
# deposit and the legacy XLA-scatter formulation must match.
# ---------------------------------------------------------------------------

from huffman_tpu.constants import PRELOAD_WORDS
from huffman_tpu.container import interleave as il
from huffman_tpu.ops.pallas_encode import (
    pack_streams_kernel_deposit,
    pack_streams_pallas,
)


def _random_protocol_case(seed, n_real, B, min_len, max_len, n_groups=1):
    """Random (codes, eff_lens, slab) agreeing with the protocol: real
    steps carry random codes of random lengths, garbage steps carry
    min_len with code 0."""
    rng = np.random.default_rng(seed)
    n_lanes = n_groups * GROUP_LANES
    n_pairs = n_real * B - rng.integers(0, B) if n_real else 0

    lens = rng.integers(min_len, max_len + 1, size=(n_lanes, B)).astype(np.int32)
    codes = (rng.integers(0, 1 << 30, size=(n_lanes, B)).astype(np.uint64)
             & ((np.uint64(1) << lens.astype(np.uint64)) - np.uint64(1))).astype(np.uint32)
    flat_valid = np.arange(n_lanes * B) < n_pairs
    valid = flat_valid.reshape(n_lanes, B)
    codes = np.where(valid, codes, 0).astype(np.uint32)
    eff = np.where(valid, lens, min_len).astype(np.int32)
    # never-consumed pad lanes still carry protocol lengths
    real_bits = np.where(valid, lens, 0)
    W = max(int(real_bits.sum(axis=1).max() + 31) // 32, 1)
    from huffman_tpu.bitio import pack_codes_blocked

    slab, _ = pack_codes_blocked(codes, np.where(valid, lens, 0), W)
    return codes, eff, slab, n_pairs, n_lanes


@pytest.mark.parametrize(
    "seed,n_real,B,min_len,max_len,n_groups",
    [
        (0, 1000, 32, 1, 18, 1),      # mixed lengths, pad lanes
        (1, 1024, 32, 1, 1, 1),       # all-ones: minimum fire density
        (2, 1024, 16, 32, 32, 1),     # all-32: every step fires, cap tight
        (3, 2400, 16, 1, 32, 3),      # multiple groups, full length range
        (4, 700, 16, 1, 2, 1),        # tiny totals: lanes with <64 bits
        (5, 1, 32, 5, 12, 1),         # single real lane
    ],
)
def test_pack_streams_matches_spec(seed, n_real, B, min_len, max_len, n_groups):
    codes, eff, slab, n_pairs, n_lanes = _random_protocol_case(
        seed, n_real, B, min_len, max_len, n_groups
    )
    ref = il.build_interleaved_streams(slab, eff, n_real)

    # Exact per-group cap (the contract: cap must bound EVERY group).
    body_max = max(s.size - PRELOAD_WORDS * GROUP_LANES for s in ref)
    for cap in {max(body_max, 1), B * GROUP_LANES}:
        for fn in (pack_streams_pallas, pack_streams_kernel_deposit):
            streams, counts = fn(
                jnp.asarray(codes), jnp.asarray(eff), jnp.int32(n_real),
                words_cap=cap, interpret=True,
            )
            streams = np.asarray(streams)
            counts = np.asarray(counts)
            for g, s in enumerate(ref):
                assert counts[g] == s.size, (fn.__name__, cap, g)
                got = streams[g]
                np.testing.assert_array_equal(
                    got[: s.size], s, err_msg=f"{fn.__name__} cap={cap} g={g}"
                )
                assert not got[s.size:].any(), (fn.__name__, cap, g)


def test_pack_streams_two_fires_later_identity():
    """The word at each consumption slot is the word the encoder completes
    two fires later in the same lane — checked directly against a scalar
    simulation, independent of the container layer."""
    rng = np.random.default_rng(9)
    B = 24
    n_real = 300
    codes, eff, slab, n_pairs, n_lanes = _random_protocol_case(
        9, n_real, B, 1, 32, 1
    )
    streams, counts = pack_streams_pallas(
        jnp.asarray(codes), jnp.asarray(eff), jnp.int32(n_real),
        words_cap=B * GROUP_LANES, interpret=True,
    )
    stream = np.asarray(streams)[0][: int(np.asarray(counts)[0])]

    # Scalar decoder-side simulation: lane l's j-th refill (j from 0) must
    # return slab word PRELOAD_WORDS + j of that lane (zero past the end).
    bits = np.where(np.arange(n_lanes) < n_real, 64, 1 << 30).astype(np.int64)
    nxt = np.full(n_lanes, PRELOAD_WORDS, dtype=np.int64)
    head = PRELOAD_WORDS * GROUP_LANES
    W = slab.shape[1]
    for l in range(min(n_real, n_lanes)):
        np.testing.assert_array_equal(stream[l], slab[l, 0] if W > 0 else 0)
        np.testing.assert_array_equal(
            stream[GROUP_LANES + l], slab[l, 1] if W > 1 else 0
        )
    for t in range(B):
        bits -= eff[:, t]
        mask = bits < 33
        for l in np.flatnonzero(mask):
            expect = slab[l, nxt[l]] if nxt[l] < W else 0
            assert stream[head] == expect, (t, l, head)
            nxt[l] += 1
            bits[l] += 32
            head += 1
    assert head == stream.size


def test_staging_multi_invariant():
    """The staging kernel's group-interleave width (decode-multi analog)
    must not change output: multi 2/3 on a 3-group case and multi 2 on a
    non-dividing 3-group case (zero-group padding) match multi=1."""
    from huffman_tpu.ops.pallas_encode import _staging

    codes, eff, slab, n_pairs, n_lanes = _random_protocol_case(
        7, 2400, 16, 1, 32, 3
    )
    ref = np.asarray(
        _staging(jnp.asarray(codes), jnp.asarray(eff), True, 1)
    )
    for multi in (2, 3):
        got = np.asarray(
            _staging(jnp.asarray(codes), jnp.asarray(eff), True, multi)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"multi={multi}")
    # and through the full stream pack
    r1 = pack_streams_pallas(
        jnp.asarray(codes), jnp.asarray(eff), jnp.int32(2400),
        words_cap=16 * GROUP_LANES, interpret=True, staging_multi=2,
    )
    r0 = pack_streams_pallas(
        jnp.asarray(codes), jnp.asarray(eff), jnp.int32(2400),
        words_cap=16 * GROUP_LANES, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r0[0]))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r0[1]))
