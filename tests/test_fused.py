"""Fused device pipeline tests: encode_device (histogram -> package-merge
codebook -> pack -> interleave in one jit) against the host pipeline, and
the on-device roundtrip."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.container import block_format as bf
from huffman_tpu.container import interleave as il
from huffman_tpu.ops.device_interleave import build_streams_device
from huffman_tpu.ops.fused import encode_device, roundtrip_device
from huffman_tpu.ops.pallas_decode import GROUP_LANES


def _case(seed, npairs, nalpha, zipf=True):
    rng = np.random.default_rng(seed)
    alpha = rng.choice(MAX_SYMBOLS, max(nalpha, 1), replace=False)
    if zipf and nalpha > 1:
        p = 1.0 / np.arange(1, nalpha + 1) ** 1.1
        p /= p.sum()
        symbols = rng.choice(alpha, npairs, p=p).astype(np.uint16)
    else:
        symbols = rng.choice(alpha, npairs).astype(np.uint16)
    return symbols


@pytest.mark.parametrize(
    "seed,npairs,nalpha",
    [(0, 30000, 150), (1, 2000, 1), (2, 100000, 3000), (3, 513, 2)],
)
def test_device_roundtrip(seed, npairs, nalpha):
    B = 64
    symbols = _case(seed, npairs, nalpha)
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:npairs] = symbols
    ok, words = roundtrip_device(padded, np.int32(npairs), B, interpret=True)
    assert bool(ok)
    assert int(words) > 0


def test_fused_streams_match_host_pipeline():
    B = 64
    symbols = _case(7, 50000, 500)
    npairs = symbols.size
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:npairs] = symbols

    r = encode_device(padded, np.int32(npairs), B, interpret=True)
    dev_lengths = np.asarray(r["lengths"])

    # Host pipeline seeded with the device codebook's lengths must produce
    # byte-identical streams (the codebooks themselves may differ in
    # optimal tie-breaking; the protocol does not).
    cb = Codebook.from_lengths(dev_lengths.astype(np.uint8))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(dev_lengths[dev_lengths > 0].min())
    eff = il.effective_lengths(lens, npairs, min_len, n_lanes, B)
    ref_streams = il.build_interleaved_streams(slab, eff, n_real)

    counts = np.asarray(r["counts"])
    streams = np.asarray(r["streams"])
    assert len(ref_streams) == streams.shape[0]
    for g, rs in enumerate(ref_streams):
        assert counts[g] == rs.size
        assert np.array_equal(streams[g, : counts[g]], rs)


def test_device_interleave_matches_numpy_sim():
    B = 32
    symbols = _case(11, 40000, 200)
    npairs = symbols.size
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, npairs, min_len, n_lanes, B)
    ref = il.build_interleaved_streams(slab, eff, n_real)
    streams, counts = build_streams_device(
        slab.astype(np.uint32), eff, np.int32(n_real), words_cap=B * GROUP_LANES
    )
    streams, counts = np.asarray(streams), np.asarray(counts)
    for g, rs in enumerate(ref):
        assert counts[g] == rs.size
        assert np.array_equal(streams[g, : counts[g]], rs)


def test_fused_displacement_tier_matches_host(tmp_path=None):
    """gather='displacement' (on-device table pack + Pallas lane gather)
    must produce the identical streams to the host pipeline, with ok=True
    for an in-tier alphabet."""
    B = 16
    symbols = _case(13, 9000, 400)
    npairs = symbols.size
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:npairs] = symbols
    # Small explicit ladder: the interpreter unrolls each tier's lane-
    # gather tree, so tracing the default 65536 top tier would dominate
    # test time without adding coverage (the real-ladder switch is chip
    # territory — scripts/chip_check.py --sweep).
    r = encode_device(
        padded, np.int32(npairs), B, interpret=True, gather="displacement",
        max_len=18, tiers=(1024,), alphabet_cap=4096,
    )
    assert bool(r["ok"])
    cb = Codebook.from_lengths(np.asarray(r["lengths"]))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, npairs, min_len, n_lanes, B)
    ref = il.build_interleaved_streams(slab, eff, n_real)
    streams, counts = np.asarray(r["streams"]), np.asarray(r["counts"])
    for g, rs in enumerate(ref):
        assert counts[g] == rs.size
        assert np.array_equal(streams[g, : counts[g]], rs)


def test_fused_alphabet_cap_overflow_flags_not_silent():
    """An alphabet past alphabet_cap must set ok=False (the caller reruns
    with the uncapped/xla tiers)."""
    B = 16
    rng = np.random.default_rng(17)
    symbols = rng.integers(0, MAX_SYMBOLS, 40000).astype(np.uint16)  # ~30k unique
    npairs = symbols.size
    n_real = (npairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:npairs] = symbols
    r = encode_device(
        padded, np.int32(npairs), B, interpret=True, alphabet_cap=1024,
        max_len=18,
    )
    assert not bool(r["ok"])
    # and the uncapped rerun is exact
    r2 = encode_device(
        padded, np.int32(npairs), B, interpret=True, alphabet_cap=None,
        gather="xla", max_len=18,
    )
    assert bool(r2["ok"])
    got = np.asarray(r2["lengths"])
    hist = np.bincount(symbols, minlength=MAX_SYMBOLS)
    # sane optimal code: Kraft-complete over the real alphabet
    k = np.sum(np.where(got > 0, 2.0 ** (-got.astype(np.float64)), 0))
    assert abs(k - 1.0) < 1e-9
    assert (got[hist > 0] > 0).all() and (got[hist == 0] == 0).all()


def test_encode_device_auto():
    """encode_device_auto returns a valid result for in-tier, wide, and
    deep-code (max_len > 26) configurations — since r3 the in-program
    tiers make the first run exact, with only the deep-code rung left."""
    from huffman_tpu.ops.fused import encode_device_auto

    B = 16
    for seed, nalpha, max_len in ((21, 400, 18), (22, 12000, 18), (23, 400, 32)):
        symbols = _case(seed, 30000, nalpha, zipf=False)
        npairs = symbols.size
        n_real = (npairs + B - 1) // B
        n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
        padded = np.zeros(n_lanes * B, np.int32)
        padded[:npairs] = symbols
        r = encode_device_auto(
            padded, np.int32(npairs), B, max_len=max_len, interpret=True,
        )
        assert bool(r["ok"])
        got = np.asarray(r["lengths"])
        hist = np.bincount(symbols, minlength=MAX_SYMBOLS)
        assert (got[hist > 0] > 0).all()
        k = np.sum(np.where(got > 0, 2.0 ** (-got.astype(np.float64)), 0))
        assert abs(k - 1.0) < 1e-9


def test_fused_tier_switch_matches_host():
    """The data-adaptive lax.switch ladder: each rung (small explicit caps
    so the interpreter stays fast) must select by n_unique and produce
    streams byte-identical to the host pipeline. The ``exact`` cases pin
    n_unique precisely ON a rung cap and one past it (the switch's
    decision points; the chip sweep covers the shipping ladder's
    boundaries the same way — chip_check exactN)."""
    B = 16
    cases = (
        (31, 100, False), (32, 700, False), (33, 2500, False),
        (34, 256, True), (35, 257, True), (36, 1024, True), (37, 1025, True),
    )
    for seed, nalpha, exact in cases:
        if exact:
            rng = np.random.default_rng(seed)
            alpha = rng.choice(MAX_SYMBOLS, nalpha, replace=False)
            symbols = np.concatenate(
                [alpha, rng.choice(alpha, 12000 - nalpha)]
            )
            rng.shuffle(symbols)
            symbols = symbols.astype(np.uint16)
            assert np.unique(symbols).size == nalpha
        else:
            symbols = _case(seed, 12000, nalpha, zipf=False)
        npairs = symbols.size
        n_real = (npairs + B - 1) // B
        n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
        padded = np.zeros(n_lanes * B, np.int32)
        padded[:npairs] = symbols
        r = encode_device(
            padded, np.int32(npairs), B, interpret=True,
            gather="displacement", max_len=18,
            tiers=(256, 1024), alphabet_cap=4096,
        )
        assert bool(r["ok"]), nalpha
        cb = Codebook.from_lengths(np.asarray(r["lengths"]).astype(np.uint8))
        slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
        min_len = int(cb.lengths[cb.lengths > 0].min())
        eff = il.effective_lengths(lens, npairs, min_len, n_lanes, B)
        ref = il.build_interleaved_streams(slab, eff, n_real)
        streams, counts = np.asarray(r["streams"]), np.asarray(r["counts"])
        for g, rs in enumerate(ref):
            assert counts[g] == rs.size, (nalpha, g)
            assert np.array_equal(streams[g, : counts[g]], rs), (nalpha, g)
